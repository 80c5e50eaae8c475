"""Shared A/B-interleaved in-jit repeat-marginal harness for TPU probes.

Cross-process (and even sequential same-process) tier measurements carry
enough chip weather to rank pipelines wrong (BENCH_NOTES round-3
probe_tier_ab / probe_tier_alloc), so every head-to-head probe measures
the SAME way: compile all cases first, then alternate A/B/A/B rounds of
(wall_R - wall_1) / (R - 1), median per case.  One implementation so the
clamp / formula / warmup can never drift between probes (bench.py keeps
a self-contained copy by design — the driver artifact must not depend on
benchmarks/)."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def ab_interleaved_marginal(cases, queries, *, r=8, rounds=10):
    """cases: {name: (body(q, *args) -> scalar, args)}; queries(seed, reps)
    -> (reps, Q, D) device array.  Returns {name: [marginal_s per round]}
    (names whose case failed to compile are absent; the failure prints)."""

    def loop(reps, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, reps, it, 0.0)
        return jax.jit(f)

    fns = {}
    for name, (body, args) in cases.items():
        try:
            f1, fR = loop(1, body), loop(r, body)
            np.asarray(f1(queries(1, 1), *args))  # compile + warm
            np.asarray(fR(queries(1, r), *args))
            fns[name] = (f1, fR, args)
        except Exception as e:  # noqa: BLE001
            print(f"# case {name} unavailable ({e})", flush=True)
    marg = {name: [] for name in fns}
    for rnd in range(rounds):
        for name, (f1, fR, args) in fns.items():
            q1 = queries(1000 + 31 * rnd, 1)
            t0 = time.perf_counter()
            np.asarray(f1(q1, *args))
            w1 = time.perf_counter() - t0
            qR = queries(5000 + 31 * rnd, r)
            t0 = time.perf_counter()
            np.asarray(fR(qR, *args))
            wR = time.perf_counter() - t0
            marg[name].append(max((wR - w1) / (r - 1), 1e-9))
    return marg


def report(marg, *, unit_scale=1e3, unit="ms", qps_q=None):
    """Print per-case medians (+ QPS when qps_q is the query batch size)."""
    for name, s in marg.items():
        arr = np.array(s) * unit_scale
        line = (
            f"{name:12s} p50 {np.median(arr):8.3f} {unit}  "
            f"IQR [{np.percentile(arr, 25):8.3f}, {np.percentile(arr, 75):8.3f}]"
        )
        if qps_q:
            line += f"  QPS {qps_q / float(np.median(np.array(s))):9.1f}"
        print(line, flush=True)
