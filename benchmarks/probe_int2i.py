"""Probe round 9: the window-granular int2 redesign on hardware.

  j1. pallas_int2_wmax alone (960 MB read, 312 KB out)
  j2. wmax -> top_k(W=2048 windows)
  j3. FULL new scan_int2_coarse_fine k=128 (the production program)
  j4. FULL at k=128, k_coarse=131072 (W=1024: the floor/latency knob)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    pallas_int2_wmax,
    quantize_queries,
    scan_int2_coarse_fine,
)

N, D = 10_002_432, 384
D4, D2 = D // 4, D // 2
allowed_np = np.array([ALLOW_ALL] + [-9] * 15, np.int32)


def gen_packed(key, r, n):
    w = jax.random.bits(key, (r, n // 4), jnp.uint32)
    return jax.block_until_ready(
        jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(r, n)
    )


def marginal(label, mk, args, reps=(1, 5), iters=3):
    walls = {}
    for r in reps:
        fn = jax.jit(mk(r))

        def queries(seed):
            q = jax.random.normal(jax.random.PRNGKey(seed), (r, 1, D), jnp.float32)
            return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

        np.asarray(fn(queries(1), *args))
        ts = []
        for i in range(iters):
            qs = queries(100 + 7 * i + r)
            t0 = time.perf_counter()
            np.asarray(fn(qs, *args))
            ts.append(time.perf_counter() - t0)
        walls[r] = float(np.median(ts))
    marg = max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)
    print(f"{label}: {marg*1e3:.3f} ms  (wall1 {walls[reps[0]]*1e3:.1f} ms)", flush=True)
    return marg


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    scales = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    scales2d = scales.reshape(1, N)
    src = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    src2d = src.reshape(1, N)
    print("arrays resident", flush=True)

    def mk_j1(r):
        def f(qs, p2, sc2, s2):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                w = pallas_int2_wmax(p2, sc2, s2, qi8, qsc, allowed, False)
                return acc + jnp.sum(w[:, ::64])
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("j1. pallas_int2_wmax only", mk_j1, (packed2, scales2d, src2d))

    for W in (256, 512):
        def mk_j2(r, W=W):
            def f(qs, p2, sc2, s2):
                def it(i, acc):
                    qi8, qsc = quantize_queries(qs[i])
                    w = pallas_int2_wmax(p2, sc2, s2, qi8, qsc, allowed, False)
                    wv, widx = jax.lax.top_k(w, W)
                    return acc + jnp.sum(wv) + jnp.sum(widx.astype(jnp.float32))
                return jax.lax.fori_loop(0, r, it, 0.0)
            return f
        marginal(f"j2. wmax -> top_k {W} windows", mk_j2, (packed2, scales2d, src2d))

    # j5: the scalar-prefetch int4 window gather kernel, selection input fixed
    from perceive_tpu.ops.topk import pallas_int4_window_scores

    widx_np = np.random.default_rng(0).choice(N // 128, 256, replace=False).astype(np.int32)
    widx0 = jax.block_until_ready(jnp.asarray(widx_np))

    def mk_j5(r):
        def f(qs, p4, s2v, s1, wix):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                sc = pallas_int4_window_scores(
                    p4, s2v, s1, (wix + i) % (N // 128), qi8, qsc, allowed, False)
                return acc + jnp.sum(sc[::16, ::16])
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("j5. gather kernel 256 windows", mk_j5,
             (packed4, scales2d, src2d, widx0))

    for kc, tag in ((0, "j3. FULL new scan k=128 (W=256)"),
                    (512 * 128, "j4. FULL new scan k=128 (W=512)")):
        def mk_j3(r, kc=kc):
            def f(qs, p2, s2v, p4, s4v, s1):
                def it(i, acc):
                    vals, rows, floor = scan_int2_coarse_fine(
                        p2, s2v, p4, s4v, s1, qs[i], allowed, 128,
                        k_coarse=kc, engine="pallas")
                    return acc + jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(floor)
                return jax.lax.fori_loop(0, r, it, 0.0)
            return f
        marginal(tag, mk_j3, (packed2, scales, packed4, scales, src))


if __name__ == "__main__":
    main()
