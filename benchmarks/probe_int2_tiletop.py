"""Round 4.5: epilogue-fused selection (select="tiletop") vs the shipped
PartialReduce select and the exact hierarchical select — FULL production
pipeline (scan_int2_coarse_fine), one process, in-jit repeat marginals,
A/B/A/B interleaved.  tiletop keeps the per-tile top-M inside the score
kernel's VMEM epilogue, so the (Q, N) coarse score buffer never reaches
HBM and no separate selection pass re-reads it; the finishing top-kc
runs over the ~T*M (=13k at 10M) candidate buffer."""
import jax, jax.numpy as jnp, numpy as np
from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D4, K, N, allowed_np, gen_packed, queries
from bench import _rand_i8t
from perceive_tpu.ops.topk import scan_int2_coarse_fine

def make(select, kc=4096):
    def body(q, p2, sc, s1, m8, allowed):
        v, rows, fl = scan_int2_coarse_fine(
            p2, sc, m8, sc, s1, q, allowed, K, k_coarse=kc,
            engine="pallas", fine_bits=8, select=select,
        )
        return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
    return body

def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    p2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    m8 = _rand_i8t(jax.random.PRNGKey(8), D, N)
    sc = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    s1 = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    print("arrays resident", flush=True)
    marg = ab_interleaved_marginal(
        {
            "approx4096": (make("approx"), (p2, sc, s1, m8, allowed)),
            "tiletop4096": (make("tiletop"), (p2, sc, s1, m8, allowed)),
            "exact4096": (make("exact"), (p2, sc, s1, m8, allowed)),
        },
        queries, r=8, rounds=15,
    )
    report(marg)

if __name__ == "__main__":
    main()
