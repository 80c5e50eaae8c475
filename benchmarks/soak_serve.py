"""Soak: the full serve stack under sustained mixed load on the real chip.

Production-readiness evidence the unit tests can't give: N minutes of
concurrent clients (unique queries, repeat queries, filtered queries,
/status polls) against a live server WHILE the background refresh loop
rescans a mutating fs source — then assert zero failed requests and no
unbounded RSS growth (the fused-program/highlight caches and the executor
queue are the leak candidates; matrix churn under query load is the race
candidate, cf. tests/test_concurrency.py for the in-process storm).

Run: python -m benchmarks.soak_serve  [SOAK_SECONDS=300] [SOAK_CLIENTS=8]
Uses the CLI's real AppState with a random-weight encoder (rankings are
meaningless; the code path is identical).
"""

import json
import os
import pathlib
import random
import tempfile
import threading
import time
import urllib.request

import numpy as np

SECONDS = float(os.environ.get("SOAK_SECONDS", "300"))
CLIENTS = int(os.environ.get("SOAK_CLIENTS", "8"))
WORDS = (
    "alpha beta gamma delta epsilon kernel matrix tensor sqlite tunnel "
    "bandwidth quantize corpus search embed shard mesh pallas attention "
    "pipeline snapshot refresh executor highlight chunk window"
).split()


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    from perceive_tpu.cli import AppState, build_parser, dispatch
    from perceive_tpu.serve import start_server

    tmp = tempfile.mkdtemp(prefix="soak_")
    docs = pathlib.Path(tmp, "docs")
    docs.mkdir()
    rng = random.Random(7)
    long_docs = os.environ.get("SOAK_LONG_DOCS") == "1"
    for i in range(400):
        # long-doc mode: every 5th document exceeds the encoder's
        # max_seq_length so the default-on chunk embedding indexes multiple
        # rows per item — the soak then churns the chunk keyspace (stale
        # chunk deletion, dedupe, underfill re-fetch) under live queries
        k = 2000 if long_docs and i % 5 == 0 else 150
        body = " ".join(rng.choices(WORDS, k=k))
        pathlib.Path(docs, f"d{i:03d}.md").write_text(f"# doc {i}\n{body}\n")

    state = AppState(str(pathlib.Path(tmp, "db.sqlite3")))
    parser = build_parser()
    # no index_interval: the refresh loop rescans interval-less sources on
    # every tick, which is exactly the churn this soak wants
    dispatch(state, parser.parse_args(
        ["source", "add", "fs", str(docs), "--name", "docs"]))
    t0 = time.time()
    dispatch(state, parser.parse_args(["source", "scan", "docs"]))
    print(f"scan of 400 docs: {time.time() - t0:.1f}s", flush=True)

    server = start_server(lambda: state, port=0, refresh_interval=10.0)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    # wait for readiness (the 503 gate); /status says model_loaded, and a
    # failed build must abort the soak rather than spin forever
    while True:
        st = json.load(urllib.request.urlopen(f"{base}/status"))
        if st.get("error"):
            raise SystemExit(f"build failed: {st['error']}")
        if st.get("model_loaded"):
            break
        time.sleep(0.5)
    print("ready; soaking", SECONDS, "s with", CLIENTS, "clients", flush=True)

    stop = threading.Event()
    ok, fail, lat = [0] * CLIENTS, [0] * CLIENTS, [[] for _ in range(CLIENTS)]
    errs: list[str] = []

    def client(ci: int):
        crng = random.Random(100 + ci)
        while not stop.is_set():
            kind = crng.random()
            if kind < 0.15:
                url = f"{base}/status"
            elif kind < 0.3:  # repeat query: the executor's cache path
                url = f"{base}/search?q=kernel+matrix+bandwidth"
            elif kind < 0.4:
                url = f"{base}/search?q=snapshot&source=docs"
            else:  # unique query: full encode+sweep+highlight every time
                q = "+".join(crng.choices(WORDS, k=4)) + f"+{crng.randrange(1_000_000)}"
                url = f"{base}/search?q={q}"
            t = time.perf_counter()
            try:
                with urllib.request.urlopen(url, timeout=120) as r:
                    json.load(r)
                ok[ci] += 1
                lat[ci].append(time.perf_counter() - t)
            except Exception as e:  # noqa: BLE001
                fail[ci] += 1
                if len(errs) < 10:
                    errs.append(f"{url}: {e}")

    def mutator():
        """Churn the source so the refresh loop rescans under load."""
        mrng = random.Random(9)
        i = 400
        while not stop.is_set():
            time.sleep(12)
            # add one, change one, remove one
            pathlib.Path(docs, f"d{i:03d}.md").write_text(
                "# new\n" + " ".join(mrng.choices(WORDS, k=150)))
            victim = docs / f"d{mrng.randrange(0, 400):03d}.md"
            if victim.exists():
                victim.write_text("# changed\n" + " ".join(mrng.choices(WORDS, k=150)))
            gone = docs / f"d{mrng.randrange(0, 400):03d}.md"
            gone.unlink(missing_ok=True)
            i += 1

    rss0 = _rss_mb()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(CLIENTS)]
    threads.append(threading.Thread(target=mutator, daemon=True))
    for t in threads:
        t.start()
    mid_rss = []
    end = time.time() + SECONDS
    while time.time() < end:
        time.sleep(10)
        mid_rss.append(_rss_mb())
    stop.set()
    for t in threads[:CLIENTS]:
        t.join(timeout=150)
    rss1 = _rss_mb()
    server.shutdown()
    state.close()

    total_ok, total_fail = sum(ok), sum(fail)
    alllat = np.array(sorted(x for l in lat for x in l))
    print(json.dumps({
        "soak_seconds": SECONDS,
        "clients": CLIENTS,
        "requests_ok": total_ok,
        "requests_failed": total_fail,
        "qps": round(total_ok / SECONDS, 1),
        "p50_ms": round(float(np.median(alllat)) * 1e3, 1) if len(alllat) else None,
        "p95_ms": round(float(np.percentile(alllat, 95)) * 1e3, 1) if len(alllat) else None,
        "p99_ms": round(float(np.percentile(alllat, 99)) * 1e3, 1) if len(alllat) else None,
        "rss_start_mb": round(rss0, 1),
        "rss_end_mb": round(rss1, 1),
        "rss_peak_mb": round(max(mid_rss + [rss1]), 1) if mid_rss else round(rss1, 1),
        # every-10s series: distinguishes warmup growth (plateau) from a leak
        "rss_series_mb": [round(x, 1) for x in mid_rss],
        "errors": errs,
    }), flush=True)
    if total_fail:
        raise SystemExit(f"{total_fail} failed requests")


if __name__ == "__main__":
    main()
