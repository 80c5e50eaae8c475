"""40M x 384 int4 corpus built through the PRODUCTION EmbeddingMatrix
(VERDICT r2 #3 done-criterion).

Round 2's f32 RAM mirror capped this at host RAM (61 GB at 40M rows); the
advertised 40M capacity was a device-side probe only.  This builds the
corpus through the real EmbeddingMatrix/Searcher stack — mmap-spilled
mirror, chunked staging, packed int4 device matrix — then:

  * reports host RSS at each stage (target: <= 2x device bytes);
  * runs planted-neighbor queries through Searcher.search_vector and
    checks the f32 rerank (reading the mmap mirror) returns the planted
    row first with its EXACT f32 score.

Run on the TPU-attached host:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/capacity_40m.py
Off-TPU it shrinks to 2M rows so the path stays testable anywhere
(--rows overrides).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.index.matrix import INT4, EmbeddingMatrix
from perceive_tpu.index.searcher import Searcher

CHUNK = 1_048_576


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 2**20
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    on_tpu = jax.default_backend() == "tpu"
    ap.add_argument("--rows", type=int, default=40_370_176 if on_tpu else 2_097_152)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--queries", type=int, default=50 if on_tpu else 8)
    args = ap.parse_args()
    n, d = args.rows, args.dim

    stages = {"rss_start_gb": round(rss_gb(), 2)}
    t0 = time.time()
    m = EmbeddingMatrix(d, dtype=INT4, capacity=n)
    s = Searcher(0, 0, d, dtype=INT4, matrix=m, engine="auto")

    rng = np.random.default_rng(0)
    planted: list[tuple[int, np.ndarray]] = []
    for lo in range(0, n, CHUNK):
        hi = min(lo + CHUNK, n)
        # uniform f32 (3x faster to generate than gaussian on the 1-core
        # host); magnitudes don't matter — per-row scales absorb them and
        # planted-neighbor top-1 holds for any iid rows
        vecs = rng.random((hi - lo, d), dtype=np.float32) - 0.5
        # keys are chunk keys (item_id * 4096), exactly what
        # Searcher.upsert_embeddings would store
        m.upsert(np.arange(lo + 1, hi + 1) * 4096, np.zeros(hi - lo, np.int32), vecs)
        while len(planted) < args.queries * (hi / n):
            i = rng.integers(0, hi - lo)
            planted.append((lo + int(i) + 1, vecs[int(i)].copy()))
    stages["build_s"] = round(time.time() - t0, 1)
    stages["rss_after_build_gb"] = round(rss_gb(), 2)
    stages["mirror_is_mmap"] = m._mirror.is_mmap

    t0 = time.time()
    m.sync()  # chunked int4 staging + one device upload
    jax.block_until_ready(m._device_vectors)
    stages["sync_s"] = round(time.time() - t0, 1)
    dev_bytes = m._device_vectors.nbytes + m._device_source_ids.nbytes
    if m._device_scales is not None:
        dev_bytes += m._device_scales.nbytes
    stages["device_gb"] = round(dev_bytes / 2**30, 2)

    # drop build-time page residency: production startup would load via
    # snapshot/mmap and never have these pages resident at all
    m._mirror.remap()
    stages["rss_after_remap_gb"] = round(rss_gb(), 2)

    ok = 0
    exact_ok = 0
    t0 = time.time()
    for iid, vec in planted:
        q = vec + 0.0005 * rng.standard_normal(d).astype(np.float32)
        hits = s.search_vector(q, 10)
        if hits and hits[0][0] == iid:
            ok += 1
        # the rerank score must be the EXACT f32 dot read via the mirror
        row = m.row_of[iid * 4096]  # chunk_key(iid, 0)
        want = float(m.host_vectors_for([row])[0] @ q)
        if hits and abs(hits[0][1] - want) < 1e-5:
            exact_ok += 1
    stages["query_s_total"] = round(time.time() - t0, 1)
    stages["rss_after_queries_gb"] = round(rss_gb(), 2)

    print(
        json.dumps(
            {
                "metric": "capacity_40m_int4_production_matrix",
                "rows": n,
                "dim": d,
                "backend": jax.default_backend(),
                "planted_top1": f"{ok}/{len(planted)}",
                "rerank_score_exact": f"{exact_ok}/{len(planted)}",
                "rss_budget_gb_2x_device": round(2 * dev_bytes / 2**30, 2),
                # the budget criterion is the steady-state serving figure
                # (post-remap): query-time RSS additionally counts jax
                # client/compile allocations and mirror pages faulted by
                # reranks — file-backed and evictable, not a floor
                "rss_within_budget": stages["rss_after_remap_gb"]
                <= 2 * dev_bytes / 2**30,
                **stages,
            }
        )
    )


if __name__ == "__main__":
    main()
