"""Probe round 21: A/B/A/B interleaved comparison — production
scan_int2_coarse_fine vs (tile 24576) vs (tile 24576 + sorted block
gather).  Staged-truncation probes (int2v/int2w) attribute phases
inconsistently (layout/DCE effects + tunnel drift), so this measures
only COMPLETE pipelines, alternating invocations of the pre-compiled
programs to cancel drift, 15 rounds of each, median-of-diffs reported.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_int2n import N, D, D4, D2, K, allowed_np, gen_packed, queries
from benchmarks.probe_int2s import fine_phase
from benchmarks.probe_int2t import sweep_tile
from benchmarks.probe_int2w import select_sorted
from perceive_tpu.ops.topk import (
    _INT2_WINDOW,
    quantize_queries,
    scan_int2_coarse_fine,
)

KC = 4096
R = 12  # in-jit repeats per call; per-iteration time = wall / R minus 1-rep wall


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

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def prod_body(q, p2, sc, s, p4, sc4):
        v, rows, fl = scan_int2_coarse_fine(p2, sc[0], p4, sc4, s[0], q, allowed, K)
        return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)

    def tile_body(sort):
        def body(q, p2, sc, s, p4, sc4):
            qi8, qscale = quantize_queries(q)
            coarse = sweep_tile(p2, sc, s, qi8, qscale, allowed, 24576)
            row = coarse[0]
            if sort:
                v, idx = select_sorted(row, KC, _INT2_WINDOW)
            else:
                nw = N // _INT2_WINDOW
                wmax = jnp.max(row.reshape(nw, _INT2_WINDOW), axis=1)
                _, widx = jax.lax.top_k(wmax, KC)
                blocks = jnp.take(row.reshape(nw, _INT2_WINDOW), widx, axis=0)
                v, p = jax.lax.top_k(blocks.reshape(-1), KC)
                idx = jnp.take(widx, p // _INT2_WINDOW) * _INT2_WINDOW + p % _INT2_WINDOW
            vals, rows = fine_phase(v[None, :], idx[None, :], qi8, qscale, p4, sc4, K)
            return jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32))
        return body

    progs = {
        "A.prod": (jax.jit(loop(1, prod_body)), jax.jit(loop(R, prod_body))),
        "B.t24576": (jax.jit(loop(1, tile_body(False))), jax.jit(loop(R, tile_body(False)))),
        "C.t24576+sort": (jax.jit(loop(1, tile_body(True))), jax.jit(loop(R, tile_body(True)))),
    }
    # warm all
    for f1, fR in progs.values():
        np.asarray(f1(queries(1, 1), *arrays))
        np.asarray(fR(queries(1, R), *arrays))
    print("warm", flush=True)

    per = {k: [] for k in progs}
    for rnd in range(15):
        for name, (f1, fR) in progs.items():
            q1 = queries(1000 + rnd, 1)
            qR = queries(2000 + rnd, R)
            t0 = time.perf_counter()
            np.asarray(f1(q1, *arrays))
            w1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(fR(qR, *arrays))
            wR = time.perf_counter() - t0
            per[name].append((wR - w1) / (R - 1))
    for name, xs in per.items():
        xs = np.array(xs) * 1e3
        print(f"{name}: median {np.median(xs):.3f} ms  iqr "
              f"[{np.percentile(xs,25):.3f}, {np.percentile(xs,75):.3f}]", flush=True)


if __name__ == "__main__":
    main()
