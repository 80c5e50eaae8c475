"""Round 5.3: focused A/B of the shipping candidates for the default
select — production (rt=.98, argsort was already dropped this round) vs
the nosort pipeline at rt .98/.95/.92 — more rounds than probe_r5_glue
for a tighter median, arrays passed as jit ARGS (a captured-constant
variant lowered 3.9 GB into every executable and compiled for 20+ min on
this session's remote compiler)."""

import jax
import jax.numpy as jnp

from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D4, K, N, allowed_np, gen_packed, queries
from bench import _rand_i8t
from benchmarks.probe_r5_glue import body_prod, make_rt


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    p2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    m8 = _rand_i8t(jax.random.PRNGKey(8), D, N)
    sc = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    s1 = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    print("arrays resident", flush=True)
    args = (p2, sc, s1, m8, allowed)
    marg = ab_interleaved_marginal(
        {
            "prod98": (body_prod, args),  # current code: approx, no argsort
            "rt98": (make_rt(0.98), args),
            "rt95": (make_rt(0.95), args),
            "rt92": (make_rt(0.92), args),
        },
        queries, r=8, rounds=25,
    )
    report(marg)


if __name__ == "__main__":
    from perceive_tpu.cli.state import _enable_jit_cache

    _enable_jit_cache()
    main()
