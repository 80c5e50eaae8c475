"""Round 4.4 (VERDICT r3 #2c): adaptive coarse-fetch — when the corpus
self-audit measures small reference displacements (isotropic corpora:
mean coarse rank ~10-100), the kc=4096 fetch is 40x deeper than needed.
Sweep kc at the shipped rt=0.98 to price the cut; the audit would gate
kc by the measured displacement tail, with escalation-on-floor covering
the residual exactly as at kc=4096."""
import jax, jax.numpy as jnp, numpy as np
from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D4, K, N, allowed_np, gen_packed, queries
from bench import _rand_i8t
from benchmarks.probe_int2_approx import _coarse, _fine_phase, body_exact
from benchmarks.probe_int2_approx3 import make

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
            "exact4096": (body_exact, (p2, sc, s1, m8, allowed)),
            "a4096_98": (make(4096, 0.98), (p2, sc, s1, m8, allowed)),
            "a2048_98": (make(2048, 0.98), (p2, sc, s1, m8, allowed)),
            "a1024_98": (make(1024, 0.98), (p2, sc, s1, m8, allowed)),
            "a512_98": (make(512, 0.98), (p2, sc, s1, m8, allowed)),
        },
        queries, r=8, rounds=15,
    )
    report(marg)

if __name__ == "__main__":
    main()
