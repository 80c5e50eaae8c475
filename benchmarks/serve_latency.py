"""Warm end-to-end serve query latency (VERDICT r2 #1 done-criterion).

Builds the REAL serving stack — AppState, ServeState warmup, executor with
the fused text path, HTTP server — over a synthetic fs corpus, then measures
warm /search walls.  On the tunneled bench device the reference point is the
tunnel RTT (~45-50 ms): round 2 measured 210-240 ms (encode, sweep,
highlight as separate dispatches); the fused path targets ~2 RTTs
(fused encode+sweep = 1 dispatch, highlight = the unavoidable second).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serve_latency.py
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import urllib.request

import numpy as np


def main() -> None:
    import jax

    base = tempfile.mkdtemp(prefix="serve_bench_")
    docs = f"{base}/docs"
    os.makedirs(docs)
    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta", "search", "vector", "index",
             "engine", "document", "corpus", "query", "result"]
    for i in range(200):
        body = " ".join(rng.choice(words, size=40))
        with open(f"{docs}/doc{i:04d}.md", "w") as f:
            f.write(body + "\n")

    try:
        from perceive_tpu.cli.state import AppState
        from perceive_tpu.db import add_source
        from perceive_tpu.serve import start_server
        from perceive_tpu.sources import scan_source
        from perceive_tpu.types import Source

        app = AppState(f"{base}/db.sqlite3")
        src = add_source(
            app.db, Source(name="docs", config={"type": "fs"}, location=docs)
        )
        t0 = time.time()
        scan_source(app.db, app.model, src, on_embeddings=app.searcher.upsert_embeddings)
        scan_s = time.time() - t0
        app.refresh_sources()

        server = start_server(lambda: app, port=0)
        port = server.server_address[1]
        st = server.perceive_state
        st.ready.wait(600)  # includes the pre-readiness jit warmup

        def query(q: str) -> float:
            t0 = time.monotonic()
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/search?q={q}&k=10", timeout=120
            ) as r:
                r.read()
            return time.monotonic() - t0

        # absorb residual shape-variant compiles before timing
        for q in ("alpha%20beta", "vector%20engine", "document"):
            query(q)

        # steady state includes the background highlight prewarm (round 3):
        # wait for it so the "first-seen" phase measures the production
        # post-warm path, not the transient cold cache
        # target = eligible DOCUMENTS (not per-chunk matrix rows), capped by
        # the cache's entry budget; stop early if the cache starts evicting
        cache = app.highlights_model._highlight_cache
        n_docs = app.db.read().execute(
            "SELECT COUNT(*) FROM items WHERE hidden_at IS NULL"
            " AND skipped IS NULL AND content != ''"
        ).fetchone()[0]
        target = min(n_docs, cache.max_docs)
        warm_deadline = time.time() + 120
        while (
            time.time() < warm_deadline
            and len(cache) < target
            and cache.evictions == 0
        ):
            time.sleep(0.5)
        warmed = st.highlight_warmed_total

        # tunnel RTT reference: a trivial device op round trip
        import jax.numpy as jnp

        x = jnp.ones((8, 8))
        np.asarray(x * 2)
        rtts = []
        for i in range(5):
            t0 = time.monotonic()
            np.asarray(x * (2.0 + i))
            rtts.append(time.monotonic() - t0)
        rtt = float(np.median(rtts))

        qs = ["alpha%20vector", "search%20engine%20corpus", "delta%20query",
              "index%20result", "gamma%20document", "beta%20engine",
              "corpus%20index%20alpha", "vector%20result%20delta"]
        walls = [query(q) for q in qs]
        # repeat pass: the result documents' highlight chunks are now in the
        # chunk cache and the query embedding comes out of the fused search
        # dispatch, so highlight needs NO device round trip — this is the
        # steady-state wall for a working set of repeat documents
        walls_repeat = [query(q) for q in qs]

        # concurrent phase: N client threads hammering /search — the
        # executor coalesces text queries into batched encodes + shared
        # sweeps (the reference served one query per Tauri command)
        import threading

        n_clients, per_client = 16, 6
        lat: list[float] = []
        lat_lock = threading.Lock()
        barrier = threading.Barrier(n_clients)

        def client(ci: int) -> None:
            barrier.wait()
            for j in range(per_client):
                w = query(qs[(ci + j) % len(qs)])
                with lat_lock:
                    lat.append(w)

        t0 = time.monotonic()
        threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        conc_wall = time.monotonic() - t0

        # concurrent phase 2: every request a UNIQUE query string, so the
        # result cache (round 3) never hits and the number isolates the
        # coalesced encode+sweep path (the repeat phase above reflects the
        # cache-assisted working-set steady state)
        lat_u: list[float] = []
        barrier2 = threading.Barrier(n_clients)

        def client_unique(ci: int) -> None:
            barrier2.wait()
            for j in range(per_client):
                w = query(qs[(ci + j) % len(qs)] + f"%20u{ci}x{j}")
                with lat_lock:
                    lat_u.append(w)

        t0 = time.monotonic()
        threads = [
            threading.Thread(target=client_unique, args=(i,)) for i in range(n_clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        conc_unique_wall = time.monotonic() - t0

        # client-count sweep (VERDICT r3 #6): unique queries at 1/8/64
        # concurrent clients, p50/p99 per level — the executor's coalescing
        # win shows as sub-linear p50 growth with client count
        def sweep_level(n_cl: int, tag: str) -> dict:
            per = max(96 // n_cl, 2)
            lats: list[float] = []
            lk = threading.Lock()
            bar = threading.Barrier(n_cl)

            def cl(ci: int) -> None:
                bar.wait()
                for j in range(per):
                    w = query(qs[(ci + j) % len(qs)] + f"%20{tag}{ci}x{j}")
                    with lk:
                        lats.append(w)

            t0 = time.monotonic()
            ts = [threading.Thread(target=cl, args=(i,)) for i in range(n_cl)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            wall = time.monotonic() - t0
            return {
                "clients": n_cl,
                "qps": round(n_cl * per / wall, 1),
                "p50_ms": round(float(np.median(lats)) * 1e3, 1),
                "p99_ms": round(float(np.quantile(lats, 0.99)) * 1e3, 1),
            }

        levels = [sweep_level(n, f"s{n}q") for n in (1, 8, 64)]

        print(
            json.dumps(
                {
                    "metric": "warm_serve_query_wall_ms",
                    "backend": jax.default_backend(),
                    "p50_ms": round(float(np.median(walls)) * 1e3, 1),
                    "min_ms": round(min(walls) * 1e3, 1),
                    "max_ms": round(max(walls) * 1e3, 1),
                    "tunnel_rtt_ms": round(rtt * 1e3, 1),
                    "walls_over_rtt": round(float(np.median(walls)) / max(rtt, 1e-9), 2),
                    "p50_repeat_ms": round(float(np.median(walls_repeat)) * 1e3, 1),
                    "min_repeat_ms": round(min(walls_repeat) * 1e3, 1),
                    "repeat_walls_over_rtt": round(
                        float(np.median(walls_repeat)) / max(rtt, 1e-9), 2
                    ),
                    "concurrent_clients": n_clients,
                    "concurrent_qps": round(n_clients * per_client / conc_wall, 1),
                    "concurrent_p50_ms": round(float(np.median(lat)) * 1e3, 1),
                    "concurrent_p95_ms": round(float(np.quantile(lat, 0.95)) * 1e3, 1),
                    "concurrent_unique_qps": round(
                        n_clients * per_client / conc_unique_wall, 1
                    ),
                    "concurrent_unique_p50_ms": round(float(np.median(lat_u)) * 1e3, 1),
                    "client_sweep_unique": levels,
                    "result_cache_hits": st.executor.result_cache_hits,
                    "scan_s": round(scan_s, 1),
                    "highlight_prewarmed_docs": warmed,
                    "rows": len(app.searcher.matrix),
                }
            )
        )
        server.shutdown()
        st.stop()
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
