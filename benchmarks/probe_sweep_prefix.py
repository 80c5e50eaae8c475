"""Validate the prefix sweep on hardware: a 10M-row corpus living in a
16.78M-capacity matrix (the real power-of-2 growth endpoint) should pay
for ~10.02M rows, not 16.78M — the ~40% dead-row overhang every
production query paid before round-3's sweep_rows.

Measures the int2 coarse-to-fine pipeline and the int4 single-query
sweep at n_sweep=0 (old behavior: full capacity) vs n_sweep=ladder(10M),
plus exactness vs the full sweep on live rows."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_int2n import D, D4, D2, K, allowed_np, gen_packed
from perceive_tpu.index.matrix import sweep_rows_for
from perceive_tpu.ops.topk import (
    pallas_topk_int4_unsorted,
    quantize_queries,
    scan_int2_coarse_fine,
)

CAP = 16_777_216
HWM = 10_000_000


def main():
    assert jax.default_backend() == "tpu"
    ns = sweep_rows_for(HWM, CAP)
    print(f"capacity {CAP}  hwm {HWM}  sweep_rows {ns} ({ns/HWM-1:+.1%} overhang)", flush=True)
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, CAP)
    # chunk the fat int4 companion's generation: full-size uint32
    # intermediates would peak ~8 GB on top of what's resident
    halves = [gen_packed(jax.random.PRNGKey(40 + i), D2 // 2, CAP) for i in range(2)]
    packed4 = jax.block_until_ready(jnp.concatenate(halves, axis=0))
    del halves
    scales = jax.block_until_ready(jnp.full((CAP,), 0.01, jnp.float32))
    # live prefix [0, HWM); everything past it is dead (src = -1)
    src = jax.block_until_ready(
        jnp.where(jnp.arange(CAP, dtype=jnp.int32) < HWM, 0, -1).astype(jnp.int32))
    arrays = (packed2, scales, src, packed4, allowed)
    print("arrays resident", flush=True)

    def queries(seed, r):
        q = jax.random.normal(jax.random.PRNGKey(seed), (r, 1, D), jnp.float32)
        return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

    def marginal(label, mk, reps=(1, 5), iters=3):
        walls = {}
        for r in reps:
            fn = jax.jit(mk(r))
            np.asarray(fn(queries(1, r), *arrays))
            ts = []
            for i in range(iters):
                qs = queries(100 + 7 * i + r, r)
                t0 = time.perf_counter()
                np.asarray(fn(qs, *arrays))
                ts.append(time.perf_counter() - t0)
            walls[r] = float(np.median(ts))
        marg = max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)
        print(f"{label}: {marg*1e3:.3f} ms", flush=True)

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def mk_int2(nsweep):
        def body(q, p2, sc, s1, p4, al):
            v, rows, fl = scan_int2_coarse_fine(
                p2, sc, p4, sc, s1, q, al, K, n_sweep=nsweep)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
        return lambda r: loop(r, body)

    def mk_int4(nsweep):
        def body(q, p2, sc, s1, p4, al):
            qi8, qsc = quantize_queries(q)
            v, rows = pallas_topk_int4_unsorted(
                p4, sc.reshape(1, -1), s1.reshape(1, -1), qi8, qsc, al,
                K, False, nsweep)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
        return lambda r: loop(r, body)

    # exactness: prefix and full sweeps agree on the live rows
    q0 = queries(7, 1)[0]
    f_full = jax.jit(lambda q, *a: scan_int2_coarse_fine(
        a[0], a[1], a[3], a[1], a[2], q, a[4], K)[1])
    f_pre = jax.jit(lambda q, *a: scan_int2_coarse_fine(
        a[0], a[1], a[3], a[1], a[2], q, a[4], K, n_sweep=ns)[1])
    r_full = set(np.asarray(f_full(q0, *arrays))[0].tolist())
    r_pre = set(np.asarray(f_pre(q0, *arrays))[0].tolist())
    assert r_full == r_pre, "prefix sweep diverged from full sweep"
    print("exactness OK (prefix == full on live rows)", flush=True)

    marginal("int2 full-capacity sweep (old)", mk_int2(0))
    marginal("int2 prefix sweep (new)", mk_int2(ns))
    marginal("int4 full-capacity sweep (old)", mk_int4(0))
    marginal("int4 prefix sweep (new)", mk_int4(ns))


if __name__ == "__main__":
    main()
