"""Round 4.3: pick the approx operating point — (k', recall_target) pairs
trade PartialReduce buffer size (miss prob ~ rank/L) vs aggregation-sort
and fine-phase depth cost."""
import jax, jax.numpy as jnp, numpy as np
from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D4, K, N, allowed_np, gen_packed, queries
from bench import _rand_i8t
from benchmarks.probe_int2_approx import _coarse, _fine_phase, body_exact

def make(kc, rt):
    def body(q, p2, sc, s1, m8, allowed):
        coarse, qi8, qscale = _coarse(q, p2, sc, s1, allowed)
        row = coarse[0]
        av, ai = jax.lax.approx_max_k(row, kc, recall_target=rt)
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
            "exact": (body_exact, (p2, sc, s1, m8, allowed)),
            "a4096_95": (make(4096, 0.95), (p2, sc, s1, m8, allowed)),
            "a4096_98": (make(4096, 0.98), (p2, sc, s1, m8, allowed)),
            "a6144_95": (make(6144, 0.95), (p2, sc, s1, m8, allowed)),
            "a8192_95": (make(8192, 0.95), (p2, sc, s1, m8, allowed)),
        },
        queries, r=8, rounds=15,
    )
    report(marg)

if __name__ == "__main__":
    main()
