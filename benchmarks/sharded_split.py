"""Sharded query: scan-vs-merge timing split (VERDICT r2 #5 datapoint).

The sharded query program is per-chip scan -> all_gather of (Q, kl)
candidates -> tiny merge top-k, all in ONE compiled program
(perceive_tpu/parallel/search.py).  This probe quantifies what the merge
adds on top of the local scans by compiling two variants over the same
row-sharded corpus:

    scan-only   shard_map local top-k, NO collective (per-shard outputs)
    scan+merge  the production _sharded_scan path

and reports (full - scan_only) as the merge cost, alongside the analytic
ICI model: the all_gather moves Q * kl * 8 bytes per chip (f32 scores +
int32 rows) x (ndev - 1) hops of a bidirectional ring.

Run anywhere: on the virtual 8-device CPU mesh this is a *simulated* split
(collectives are memcpys) — the structural number that matters is merge
bytes vs scan bytes, which is hardware-independent: at 1M x 384 x 8 shards
the scan reads 384 B/row x 131072 rows/chip = 50 MB/chip while the merge
gathers Q*kl*8*7 bytes total (k=64, Q=16: 57 KB) — 3 orders of magnitude
less traffic, riding links faster than HBM.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/sharded_split.py [--rows 1048576] [--q 16] [--k 64]
"""

from __future__ import annotations

import argparse
import json
import os
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

from jax import shard_map
from jax.sharding import PartitionSpec as P

from perceive_tpu.ops.topk import ALLOW_ALL
from perceive_tpu.parallel.mesh import ROWS_AXES, make_mesh, rows_1d_sharding, rows_sharding
from perceive_tpu.parallel.search import sharded_scan_topk


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_048_576)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--q", type=int, default=16)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    mesh = make_mesh(8) if len(jax.devices()) >= 8 else make_mesh()
    ndev = mesh.size
    n, d, nq, k = args.rows, args.dim, args.q, args.k
    rng = np.random.default_rng(0)

    matrix = jax.device_put(
        rng.standard_normal((n, d)).astype(np.float32), rows_sharding(mesh)
    )
    source_ids = jax.device_put(np.zeros(n, np.int32), rows_1d_sharding(mesh))
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))

    def queries(seed):
        q = rng.standard_normal((nq, d)).astype(np.float32)
        return jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))

    # scan-only: identical local body, no collective (per-shard outputs)
    def local_scan(m_shard, src_shard, q_):
        scores = jax.lax.dot_general(
            q_, m_shard, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        valid = src_shard >= 0
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        kl = min(k, m_shard.shape[0])
        v, i = jax.lax.top_k(scores, kl)
        return v, i

    scan_only = jax.jit(
        shard_map(
            local_scan,
            mesh=mesh,
            in_specs=(P(ROWS_AXES, None), P(ROWS_AXES), P(None, None)),
            out_specs=(P(ROWS_AXES, None), P(ROWS_AXES, None)),
            check_vma=False,
        )
    )

    def timed(fn, tag):
        np.asarray(jax.block_until_ready(fn(queries(1))))  # compile + warm
        ts = []
        for i in range(args.iters):
            q = queries(100 + i)
            t0 = time.perf_counter()
            out = fn(q)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_scan = timed(lambda q: scan_only(matrix, source_ids, q), "scan")
    t_full = timed(
        lambda q: sharded_scan_topk(mesh, matrix, source_ids, q, allowed, k),
        "full",
    )
    kl = min(k, n // ndev)
    merge_bytes_per_chip = nq * kl * 8 * (ndev - 1)  # f32 vals + i32 rows
    scan_bytes_per_chip = (n // ndev) * d * matrix.dtype.itemsize
    print(
        json.dumps(
            {
                "metric": "sharded_scan_vs_merge_split",
                "rows": n, "dim": d, "q": nq, "k": k, "ndev": ndev,
                "backend": jax.default_backend(),
                "scan_only_ms": round(t_scan * 1e3, 2),
                "scan_plus_merge_ms": round(t_full * 1e3, 2),
                "merge_ms": round((t_full - t_scan) * 1e3, 2),
                "scan_bytes_per_chip": scan_bytes_per_chip,
                "merge_bytes_per_chip": merge_bytes_per_chip,
                "merge_to_scan_byte_ratio": round(
                    merge_bytes_per_chip / scan_bytes_per_chip, 6
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
