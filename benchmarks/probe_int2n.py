"""Probe round 13: head-to-head FULL-pipeline variants in ONE process.

Cross-process probe numbers disagreed by 5x (select: 0.3-13 ms across
probe_int2e/f/i/m) — tunnel weather and compile variance swamp the
phase deltas.  So: measure candidate fixes of scan_int2_coarse_fine
against the production function in a single process, same arrays, same
marginal method.

  n0. production scan_int2_coarse_fine (kc=4096)     -- 7.4 ms repro?
  n1. batched hier select: no vmap, no 524k gidx     -- select rewrite
  n2. n1 + optimization_barrier before the fine phase -- anti-fusion
  n3. n2 at kc=2048
  n4. segmented select: (S=2048 segs) top-2/seg       -- one top_k only
  n5. n2 with the sweep tile forced to 12288          -- probe2's 672 GB/s

All exact-selection variants are set-checked against n0 first.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    _INT2_WINDOW,
    pallas_int2_scores,
    quantize_queries,
    scan_int2_coarse_fine,
    unpack_int4_xla,
)

N, D = 10_002_432, 384
D4, D2 = D // 4, D // 2
K = 128
allowed_np = np.array([ALLOW_ALL] + [-9] * 15, np.int32)


def gen_packed(key, r, n):
    w = jax.random.bits(key, (r, n // 4), jnp.uint32)
    return jax.block_until_ready(
        jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(r, n)
    )


def queries(seed, r):
    q = jax.random.normal(jax.random.PRNGKey(seed), (r, 1, D), jnp.float32)
    return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))


def marginal(label, mk, args, reps=(1, 5), iters=3):
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
    print(f"{label}: {marg*1e3:.3f} ms  (wall1 {walls[reps[0]]*1e3:.1f} ms)", flush=True)
    return marg


# --- selection variants (all take (Q, N) f32 masked coarse scores) -------

def select_hier_batched(coarse, kc):
    """Exact top-kc, batched: window-max pool -> top-kc windows -> gather
    those windows' blocks -> top-kc of the kc*W gathered; final index by
    arithmetic on p (window = widx[p // W], offset = p % W) instead of
    materializing the (kc*W,) gidx map."""
    qn, n = coarse.shape
    w = _INT2_WINDOW
    nw = n // w
    wmax = jnp.max(coarse.reshape(qn, nw, w), axis=2)
    _, widx = jax.lax.top_k(wmax, kc)  # (Q, kc)
    blocks = jnp.take_along_axis(
        coarse.reshape(qn, nw, w), widx[:, :, None], axis=1
    )  # (Q, kc, w)
    v, p = jax.lax.top_k(blocks.reshape(qn, -1), kc)
    w_of_p = jnp.take_along_axis(widx, p // w, axis=1)
    return v, w_of_p * w + p % w


def select_segmented(coarse, kc):
    """Candidate set = union of per-segment top-m (S segments, m=kc/S).
    NOT the exact top-kc, but contains the exact top-m, and the valid
    escalation floor is max_s(segment's m-th value).  ONE top_k over
    (Q*S, N/S) lanes; no gather at all."""
    qn, n = coarse.shape
    s = 2048
    m = kc // s
    segs = coarse.reshape(qn, s, n // s)
    v, p = jax.lax.top_k(segs, m)  # (Q, S, m)
    base = (jnp.arange(s) * (n // s))[None, :, None]
    return v.reshape(qn, -1), (p + base).reshape(qn, -1)


# --- fine phase (production semantics, shared across variants) -----------

def fine_phase(coarse_vals, idx, qi8, qscale, packed4, scales4, k, barrier):
    if barrier:
        coarse_vals, idx = jax.lax.optimization_barrier((coarse_vals, idx))
    order = jnp.argsort(idx, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    coarse_vals = jnp.take_along_axis(coarse_vals, order, axis=1)
    nq, kc = idx.shape
    cols = jnp.take(packed4, idx.reshape(-1), axis=1)
    lv = unpack_int4_xla(cols).reshape(-1, nq, kc)
    iscores = jnp.einsum("qd,dqk->qk", qi8, lv, preferred_element_type=jnp.int32)
    fine = iscores.astype(jnp.float32) * jnp.take(scales4, idx) * qscale
    fine = jnp.where(jnp.isfinite(coarse_vals), fine, -jnp.inf)
    vals, perm = jax.lax.top_k(fine, k)
    return vals, jnp.take_along_axis(idx, perm, axis=1)


def make_variant(select, kc, barrier, allowed):
    def run(q, p2, sc2, s2, p4, sc4):
        qi8, qscale = quantize_queries(q)
        coarse = pallas_int2_scores(p2, sc2, s2, qi8, qscale, allowed, False)
        cv, idx = select(coarse, kc)
        return fine_phase(cv, idx, qi8, qscale, p4, sc4, K, barrier)
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

    # correctness: n1 (exact select) must reproduce production's rows
    q0 = queries(7, 1)[0]
    v0, r0, _ = jax.jit(
        lambda q, p2, sc2, s2, p4, sc4: scan_int2_coarse_fine(
            p2, sc2[0], p4, sc4, s2[0], q, allowed, K
        )
    )(q0, *arrays)
    v1, r1 = jax.jit(
        lambda q, p2, sc2, s2, p4, sc4: make_variant(
            select_hier_batched, 4096, False, allowed
        )(q, p2, sc2, s2, p4, sc4)
    )(q0, *arrays)
    assert set(np.asarray(r0[0]).tolist()) == set(np.asarray(r1[0]).tolist()), (
        "batched select diverged from production rows"
    )
    np.testing.assert_allclose(np.sort(np.asarray(v0[0])), np.sort(np.asarray(v1[0])), rtol=1e-5)
    print("n1 set-check OK", flush=True)

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                v, rows = body(qs[i], *args)
                return acc + jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def mk_n0(r):
        def body(q, p2, sc2, s2, p4, sc4):
            v, rows, _ = scan_int2_coarse_fine(
                p2, sc2[0], p4, sc4, s2[0], q, allowed, K
            )
            return v, rows
        return loop(r, body)

    marginal("n0. production kc=4096", mk_n0, arrays)

    for label, sel, kc, barrier in [
        ("n1. batched hier kc=4096", select_hier_batched, 4096, False),
        ("n2. n1 + barrier", select_hier_batched, 4096, True),
        ("n3. n2 @ kc=2048", select_hier_batched, 2048, True),
        ("n4. segmented (2048 segs) kc=4096 + barrier", select_segmented, 4096, True),
    ]:
        body = make_variant(sel, kc, barrier, allowed)
        marginal(label, lambda r, b=body: loop(r, b), arrays)


if __name__ == "__main__":
    main()
