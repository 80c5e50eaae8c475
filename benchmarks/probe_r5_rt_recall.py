"""Round 5.2: candidate-recall@10 of the approx select at recall_target
0.98 / 0.95 / 0.92 / 0.90, 10M x 384 gaussian, in ONE process.

probe_r5_glue measured rt=0.90 (+ no address-ordering) at 1.577 ms vs the
shipped 2.046 — but the PartialReduce bin width doubles 32 -> 128 rows
from rt .98 to .90, so the selection's candidate misses rise.  The
operative oracle for SELECTION loss is the pipeline's own escalation
reference (the full int8-companion sweep): a reference top-10 row absent
from the coarse-selected candidate set is a miss the f32 rerank can never
repair.  This is the same definition bench.py's measure_recall carries
per-run (VERDICT r4 #6).

Leaner than recall_int2.py by design: no 7.7 GB bf16 oracle resident (the
big-program compile wedged 25+ min on this session's remote compiler),
int2 + int8t corpora only, persistent jit cache on.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _rand_i8t
from benchmarks.probe_int2n import D, D4, N, allowed_np, gen_packed
from perceive_tpu.index.searcher import _scan_topk_xla_int8t_impl
from perceive_tpu.ops.topk import quantize_queries, pallas_int2_scores

KC = 4096
RTS = (0.98, 0.95, 0.92, 0.90)
NQ = 512
B = 8


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    p2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    m8 = _rand_i8t(jax.random.PRNGKey(8), D, N)
    sc = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    s1 = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    print("arrays resident", flush=True)

    def cand_fn(rt):
        # arrays as ARGS, never captured: a closure variant lowered 3.9 GB
        # of constants into each executable and the remote compiler took
        # 20+ min per program
        @jax.jit
        def f(q, p2_, sc_, s1_, m8_, allowed_):
            qi8, qscale = quantize_queries(q)
            coarse = pallas_int2_scores(
                p2_, sc_.reshape(1, N), s1_.reshape(1, N), qi8, qscale,
                allowed_, False, N,
            )
            outs = [
                jax.lax.approx_max_k(coarse[i], KC, recall_target=rt)
                for i in range(B)
            ]
            return jnp.stack([p for _, p in outs])
        return f

    @jax.jit
    def ref_fn(q, m8_, sc_, s1_, allowed_):
        return _scan_topk_xla_int8t_impl(m8_, sc_, s1_, q, allowed_, 10)[1]

    fns = {rt: cand_fn(rt) for rt in RTS}

    def queries(seed):
        q = jax.random.normal(jax.random.PRNGKey(seed), (B, D), jnp.float32)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    t0 = time.time()
    hits = {rt: 0 for rt in RTS}
    total = 0
    for i in range(0, NQ, B):
        q = queries(4000 + i)
        ref = np.asarray(ref_fn(q, m8, sc, s1, allowed))
        cands = {
            rt: np.asarray(fns[rt](q, p2, sc, s1, m8, allowed)) for rt in RTS
        }
        for j in range(B):
            rset = set(ref[j][:10].tolist())
            total += 10
            for rt in RTS:
                hits[rt] += len(rset & set(cands[rt][j].tolist()))
        if i % 64 == 0:
            print(f"# {i + B}/{NQ} queries, {time.time() - t0:.0f}s", flush=True)
    for rt in RTS:
        print(
            f"rt={rt}: candidate_recall_at_10 = {hits[rt] / total:.6f} "
            f"({total // 10} queries)",
            flush=True,
        )


if __name__ == "__main__":
    from perceive_tpu.cli.state import _enable_jit_cache

    _enable_jit_cache()
    main()
