"""Probe: startup cost at corpus scale — cold SQLite rebuild vs snapshot
load + replay.

The reference prints "Built search in N seconds" at every startup
(perceive-cli/state.rs:33-41): its HNSW graphs are rebuilt from the
embedding BLOBs each run.  This framework's analog is Searcher.build,
which either streams every BLOB out of SQLite (cold) or loads the
vector_shards .npz snapshot and replays only rows written after it
(SURVEY §5.4 fast-reload).  Neither path had a measured number at corpus
scale; this probe times both through the production code path, plus
save_snapshot itself, then sanity-checks that both searchers rank
identically.

PERCEIVE_TPU_STARTUP_N overrides the row count (default 2,000,000 x 384
f32 BLOBs = 3.1 GB of SQLite, auto tier = int8 at that size).  Rates are
reported per-GB so the 10M story is arithmetic.  See `# RESULT` below
after a hardware run.
"""

import json
import os
import shutil
import tempfile
import time

import numpy as np

N = int(os.environ.get("PERCEIVE_TPU_STARTUP_N", 2_000_000))
D = 384
CHUNK = 50_000


def main():
    from perceive_tpu.db import Database, add_source
    from perceive_tpu.index.matrix import auto_matrix_dtype
    from perceive_tpu.index.searcher import Searcher
    from perceive_tpu.types import Source

    # PERCEIVE_TPU_STARTUP_DIR: reuse an existing probe dir (the N-row
    # insert phase costs ~13 min at 10M; a timed-out run's dir survives)
    reuse = os.environ.get("PERCEIVE_TPU_STARTUP_DIR")
    base = reuse or tempfile.mkdtemp(prefix="startup_probe_")
    keep = bool(reuse) or os.environ.get("PERCEIVE_TPU_STARTUP_KEEP") == "1"
    try:
        have = (
            reuse
            and os.path.exists(f"{base}/probe.sqlite3")
            and os.path.getsize(f"{base}/probe.sqlite3") > N * D
        )
        db = Database(f"{base}/probe.sqlite3")
        if have:
            src_id, mid, mver = db.read().execute(
                "SELECT source_id, model_id, model_version FROM item_embeddings"
                " JOIN items ON items.id = item_embeddings.item_id LIMIT 1"
            ).fetchone()
            n_have = db.read().execute(
                "SELECT COUNT(*) FROM item_embeddings"
            ).fetchone()[0]
            assert n_have == N, f"reused dir has {n_have} rows, want {N}"
            print(f"# reusing {base} ({n_have} rows)", flush=True)
        src = (
            None
            if have
            else add_source(db, Source(name="p", config={"type": "fs"}, location="/x"))
        )
        if not have:
            mid, mver = db.read().execute(
                "SELECT model_id, version FROM model_versions ORDER BY model_id LIMIT 1"
            ).fetchone()

        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        next_id = 1
        for start in [] if have else range(0, N, CHUNK):
            n = min(CHUNK, N - start)
            vecs = rng.standard_normal((n, D), dtype=np.float32)
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            ids = range(next_id, next_id + n)
            with db.write() as conn:
                conn.executemany(
                    "INSERT INTO items (id, source_id, external_id, hash, content)"
                    " VALUES (?,?,?,'','')",
                    [(i, src.id, f"doc{i}") for i in ids],
                )
                conn.executemany(
                    "INSERT INTO item_embeddings (model_id, model_version, item_id,"
                    " chunk_idx, item_index_version, embedding, seq)"
                    " VALUES (?,?,?,0,0,?,?)",
                    [(mid, mver, i, vecs[j].tobytes(), i) for j, i in enumerate(ids)],
                )
            next_id += n
        t_insert = time.perf_counter() - t0
        db_gb = os.path.getsize(f"{base}/probe.sqlite3") / 1e9
        if not have:
            print(f"# inserted {N} rows ({db_gb:.2f} GB sqlite) in {t_insert:.1f}s", flush=True)

        dtype = auto_matrix_dtype(N, D)
        t0 = time.perf_counter()
        s_cold = Searcher.build(db, mid, mver, D, dtype=dtype, use_snapshot=False)
        t_cold = time.perf_counter() - t0

        q = rng.standard_normal((D,), dtype=np.float32)
        q /= np.linalg.norm(q)
        cold_hits = s_cold.search_vector(q, 10)

        t0 = time.perf_counter()
        s_cold.save_snapshot(db, f"{base}/snap.npz")
        t_save = time.perf_counter() - t0
        snap_gb = sum(
            os.path.getsize(f"{base}/{f}") for f in os.listdir(base) if f.startswith("snap")
        ) / 1e9
        del s_cold

        t0 = time.perf_counter()
        s_warm = Searcher.build(db, mid, mver, D, dtype=dtype, use_snapshot=True)
        t_warm = time.perf_counter() - t0
        warm_hits = s_warm.search_vector(q, 10)

        assert [h[0] for h in cold_hits] == [h[0] for h in warm_hits], (
            cold_hits, warm_hits)

        print(json.dumps({
            "metric": "startup",
            "rows": N,
            "tier": str(s_warm.matrix.tier_name) if hasattr(s_warm.matrix, "tier_name") else str(dtype),
            "cold_build_s": round(t_cold, 2),
            "cold_rows_per_s": round(N / t_cold),
            "snapshot_save_s": round(t_save, 2),
            "snapshot_gb": round(snap_gb, 2),
            "snapshot_load_s": round(t_warm, 2),
            "speedup": round(t_cold / t_warm, 1),
        }), flush=True)
    finally:
        if not keep:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    # persistent jit cache (same policy as bench.py / the CLI): through the
    # tunnel compiler the capacity-shaped kernels cost minutes of first
    # compiles; cached re-runs pay none
    from perceive_tpu.cli.state import _enable_jit_cache

    _enable_jit_cache()
    main()

# RESULT (1x v5e-class chip via tunnel, 2026-08-20):
#   2,000,000 x 384 f32 BLOBs (4.27 GB SQLite), auto tier = int8
#
#   v1 streaming load (per-row upsert + re-quantize), morning run:
#     cold build 149.1 s (13.4k rows/s) | save 39.1 s (3.1 GB) |
#     load + replay 37.6 s -> 4.0x the cold rebuild
#   v2 adopt load (stored quantized payload + mmap member reads), same day:
#     cold build 53.3 s (37.5k rows/s — faster chip weather this session) |
#     save 35.0 s (3.87 GB, now incl. the int8 payload + scales) |
#     load + replay 25.6 s (37.6 -> 25.6 on identical bytes+replay work,
#     -32%) -> 2.1x today's 3x-faster cold build
#   both searchers rank identically (sanity query), both runs.
# The load wall is tunnel upload + disk I/O on this 1-core host; a
# local-attach deployment pays disk + PCIe only.  Scaled: a 50k-row
# personal corpus cold-builds in ~4 s and snapshot-loads in ~1 s (the
# reference rebuilt per-source HNSW graphs at ef_c=800 every startup);
# a 10M corpus snapshot-loads in ~2 min here, dominated by bytes.
