"""TPU probe: int4 packed kernel at 10M x 384 — compile check + latency.

One process, distinct inputs per timed call, np.asarray completion (the
tunnel memoizes identical executions and can return early otherwise).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import ALLOW_ALL, scan_topk_pallas, scan_topk_pallas_int4

N = 10_002_432
D = 384
D2 = D // 2
K = 10
KB = 128  # RERANK_FACTOR_INT4(8) * 10 -> bucket 128


def gen_packed(n):
    words = jax.random.bits(jax.random.PRNGKey(0), (D2, n // 4), jnp.uint32)
    b = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(D2, n)
    return jax.block_until_ready(b)


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    packed = gen_packed(N)
    scales = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(1), (N,), jnp.float32, 0.001, 0.01)
    )
    src = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))
    print(f"gen: {time.perf_counter()-t0:.1f}s", flush=True)

    def queries(seed, batch):
        q = jax.random.normal(jax.random.PRNGKey(seed), (batch, D), jnp.float32)
        return jax.block_until_ready(q / jnp.linalg.norm(q, axis=1, keepdims=True))

    # compile + warm
    t0 = time.perf_counter()
    np.asarray(scan_topk_pallas_int4(packed, scales, src, queries(0, 1), allowed, KB)[0])
    print(f"int4 Q=1 compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    for batch, kk in ((1, KB), (16, KB), (128, KB), (512, 64)):
        np.asarray(scan_topk_pallas_int4(packed, scales, src, queries(9, batch), allowed, kk)[0])
        ts = []
        for i in range(5):
            q = queries(100 + 10 * i + batch, batch)
            t0 = time.perf_counter()
            np.asarray(scan_topk_pallas_int4(packed, scales, src, q, allowed, kk)[0])
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        gbps = (N * D2 + N * 8) / med / 1e9
        print(
            f"int4 Q={batch} k={kk}: median {med*1e3:.2f} ms  ({batch/med:.0f} QPS, {gbps:.0f} GB/s)",
            flush=True,
        )

    # bf16 regression check (refactored merge helper)
    del packed
    matrix = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.bfloat16)
    )
    np.asarray(scan_topk_pallas(matrix, src, queries(3, 1), allowed, K)[0])
    ts = []
    for i in range(3):
        q = queries(300 + i, 1)
        t0 = time.perf_counter()
        np.asarray(scan_topk_pallas(matrix, src, q, allowed, K)[0])
        ts.append(time.perf_counter() - t0)
    print(f"bf16 Q=1 k=10: median {np.median(ts)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
