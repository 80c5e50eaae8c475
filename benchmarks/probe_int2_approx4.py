"""Round 4.4: does the 24576 sweep tile win now that the select is cheap?
Round 3 rejected it because the fat tile starved the (expensive) exact
select's overlap; approx select leaves little to overlap."""
import jax, jax.numpy as jnp, numpy as np
from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D4, K, N, allowed_np, gen_packed, queries
from bench import _rand_i8t
import perceive_tpu.ops.topk as tk
from benchmarks.probe_int2_approx import _fine_phase

def make(rt, tiles):
    def body(q, p2, sc, s1, m8, allowed):
        old = tk._TILES_INT2
        oldb = tk._VMEM_BUDGET
        tk._TILES_INT2 = tiles
        tk._VMEM_BUDGET = 15 * 1024 * 1024
        try:
            n = p2.shape[1]
            qi8, qscale = tk.quantize_queries(q)
            coarse = tk.pallas_int2_scores(
                p2, sc.reshape(1, n), s1.reshape(1, n), qi8, qscale, allowed,
                False, n)
        finally:
            tk._TILES_INT2 = old
            tk._VMEM_BUDGET = oldb
        row = coarse[0]
        av, ai = jax.lax.approx_max_k(row, 4096, recall_target=rt)
        v, rows = _fine_phase(av, ai, m8, sc, qi8[0], qscale[0, 0])
        return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
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
            "t12288": (make(0.98, (12288,) + tk._TILES), (p2, sc, s1, m8, allowed)),
            "t24576": (make(0.98, (24576, 12288) + tk._TILES), (p2, sc, s1, m8, allowed)),
        },
        queries, r=8, rounds=15,
    )
    report(marg)
    if len(marg) == 2:
        d = np.array(marg["t12288"]) - np.array(marg["t24576"])
        print(f"fat tile saves: median {np.median(d)*1e3:+.3f} ms, wins {(d>0).sum()}/15")

if __name__ == "__main__":
    main()
