"""Probe round 18: high-precision (reps 2->22, 7 iters) head-to-head of
the full int2 pipeline candidates after probe_int2t found the sweep at
tile 24576 reaches the packed-read roofline (~1.2 ms vs ~1.5-1.7 at
12288; pure 960 MB read = 1.18 ms = ~816 GB/s on this chip).

  u0. production scan_int2_coarse_fine (auto tile 12288)
  u1. full pipeline, sweep tile 24576 (select+fine = production's)
  u2. u1 with the NOSRC sweep (no (1,N) i32 source-id stream)
  u3. packed-only 960 MB roofline (threshold-count, not hoistable)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_int2n import N, D, D4, D2, K, allowed_np, gen_packed, queries
from benchmarks.probe_int2s import fine_phase, select_hier1, sweep_nosrc
from benchmarks.probe_int2t import sweep_tile
from perceive_tpu.ops.topk import quantize_queries, scan_int2_coarse_fine

KC = 4096


def pipeline(sweep):
    def run(q, p2, sc2d, s2d, p4, sc4, allowed):
        qi8, qscale = quantize_queries(q)
        coarse = sweep(p2, sc2d, s2d, qi8, qscale, allowed)
        sels = [select_hier1(coarse[i], KC) for i in range(q.shape[0])]
        cv = jnp.stack([v for v, _ in sels])
        idx = jnp.stack([p for _, p in sels])
        return fine_phase(cv, idx, qi8, qscale, p4, sc4, K)
    return run


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))
    scales4 = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    arrays = (packed2, scales2d, src2d, packed4, scales4)
    print("arrays resident", flush=True)

    u1 = pipeline(lambda p2, sc, s, qi8, qs, al: sweep_tile(p2, sc, s, qi8, qs, al, 24576))
    u2 = pipeline(lambda p2, sc, s, qi8, qs, al: sweep_nosrc(
        p2, sc, qi8, qs, tile_n=24576))

    # set-check u1/u2 vs production
    q0 = queries(7, 1)[0]
    v0, r0, _ = jax.jit(
        lambda q, p2, sc, s, p4, sc4: scan_int2_coarse_fine(
            p2, sc[0], p4, sc4, s[0], q, allowed, K)
    )(q0, *arrays)
    r0set = set(np.asarray(r0[0]).tolist())
    for name, f in (("u1", u1), ("u2", u2)):
        v1, r1 = jax.jit(lambda q, *a, f=f: f(q, *a, allowed))(q0, *arrays)
        assert set(np.asarray(r1[0]).tolist()) == r0set, f"{name} diverged"
    print("set-checks OK", flush=True)

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def marginal(label, mk, args, reps=(2, 22), iters=7):
        walls = {}
        for r in reps:
            fn = jax.jit(mk(r))
            np.asarray(fn(queries(1, r), *args))
            ts = []
            for i in range(iters):
                qs = queries(100 + 7 * i + r, r)
                t0 = time.perf_counter()
                np.asarray(fn(qs, *args))
                ts.append(time.perf_counter() - t0)
            walls[r] = float(np.median(ts))
        marg = max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)
        print(f"{label}: {marg*1e3:.3f} ms", flush=True)
        return marg

    def mk_u0(r):
        def body(q, p2, sc, s, p4, sc4):
            v, rows, fl = scan_int2_coarse_fine(p2, sc[0], p4, sc4, s[0], q, allowed, K)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
        return loop(r, body)

    def mk_pipe(f):
        def mk(r):
            def body(q, p2, sc, s, p4, sc4):
                v, rows = f(q, p2, sc, s, p4, sc4, allowed)
                return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
            return loop(r, body)
        return mk

    def mk_u3(r):
        def body(q, p2, sc, s, p4, sc4):
            thr = (q[0, 0] * 64.0 + 128.0).astype(jnp.uint8)
            return jnp.sum((p2 > thr).astype(jnp.float32))
        return loop(r, body)

    marginal("u0. production (tile 12288)", mk_u0, arrays)
    marginal("u1. pipeline @ tile 24576", mk_pipe(u1), arrays)
    marginal("u2. u1 + nosrc sweep", mk_pipe(u2), arrays)
    marginal("u3. packed-only roofline", mk_u3, arrays)
    # repeat u0/u1 to bound residual weather
    marginal("u0b. production again", mk_u0, arrays)
    marginal("u1b. tile 24576 again", mk_pipe(u1), arrays)


if __name__ == "__main__":
    main()
