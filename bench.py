"""Headline benchmark: exact top-k query throughput over the HBM-resident
bf16 corpus (BASELINE.md config 1/5 — flat cosine top-k, fused Pallas scan).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured QPS / the 10k-QPS driver target (BASELINE.json;
the reference publishes no numbers, see BASELINE.md).

Measurement notes:
  * every timed call uses a DISTINCT query batch and blocks on its own
    result — the serving tunnel memoizes back-to-back identical
    (program, args) executions, so same-args loops report fantasy numbers;
  * corpus rows are generated directly in bf16 on device (10M x 384 =
    7.7 GB; no f32 staging) and row-padded to the kernel's 4096 tile;
  * the exact-scan kernel is HBM-bound at small Q and MXU-bound at large Q,
    so QPS scales with the query batch up to the compute crossover — the
    headline uses batch 2048 through the query-slabbed kernel (the serving
    path coalesces concurrent queries; index/executor.py).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import ALLOW_ALL, scan_topk_pallas

K = 10
QUERY_BATCH = 2048
TIMED_ITERS = 5


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    # row count padded to the kernel's 4096 tile (>= the 10M target corpus)
    n = 10_002_432 if on_tpu else 102_400
    d = 384

    matrix = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    source_ids = jnp.zeros((n,), jnp.int32)
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))

    def queries(seed: int, batch: int):
        q = jax.random.normal(jax.random.PRNGKey(seed), (batch, d), jnp.float32)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    scan = scan_topk_pallas
    # compile + warm both shapes (np.asarray forces REAL completion; the
    # tunnel's block_until_ready can return before the device has run)
    try:
        np.asarray(scan(matrix, source_ids, queries(0, QUERY_BATCH), allowed, K)[0])
    except Exception as e:  # noqa: BLE001 — never fail the bench run outright
        print(f"# pallas kernel unavailable ({e}); falling back to XLA engine", flush=True)
        from perceive_tpu.index.searcher import _scan_topk_xla

        def scan(m, s, q, a, k):
            return _scan_topk_xla(m, s, q, a, k)

        np.asarray(scan(matrix, source_ids, queries(0, QUERY_BATCH), allowed, K)[0])
    np.asarray(scan(matrix, source_ids, queries(0, 1), allowed, K)[0])

    sweep_times = []
    for i in range(TIMED_ITERS):
        q = jax.block_until_ready(queries(100 + i, QUERY_BATCH))
        t0 = time.perf_counter()
        np.asarray(scan(matrix, source_ids, q, allowed, K)[0])
        sweep_times.append(time.perf_counter() - t0)
    sweep = float(np.median(sweep_times))
    qps = QUERY_BATCH / sweep

    lat = []
    for i in range(TIMED_ITERS):
        q1 = jax.block_until_ready(queries(200 + i, 1))
        t0 = time.perf_counter()
        np.asarray(scan(matrix, source_ids, q1, allowed, K)[0])
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1e3)

    print(
        json.dumps(
            {
                "metric": f"exact_top{K}_qps_bf16_{n}x{d}",
                "value": round(qps, 1),
                "unit": "QPS",
                "vs_baseline": round(qps / 10_000.0, 3),
                "p50_single_query_ms": round(p50_ms, 3),
                "sweep_ms_batch2048": round(sweep * 1e3, 3),
                "effective_gbps": round(n * d * 2 / sweep / 1e9, 1),
                "backend": jax.default_backend(),
                "corpus_rows": n,
            }
        )
    )


if __name__ == "__main__":
    main()
