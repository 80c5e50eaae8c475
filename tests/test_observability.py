"""Profiling hooks + serve failure modes."""

import json
import os
import urllib.request

from perceive_tpu.utils.profiling import annotate, trace


def test_trace_disabled_is_free(monkeypatch):
    monkeypatch.delenv("PERCEIVE_TPU_TRACE_DIR", raising=False)
    with trace("noop"):
        pass  # no jax import, no files


def test_trace_writes_xplane(tmp_path):
    import jax.numpy as jnp

    with trace("unit", trace_dir=str(tmp_path)):
        with annotate("matmul"):
            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    produced = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert produced, "trace produced no files"


def test_serve_loading_and_error_states():
    import threading

    from perceive_tpu.serve import ServeState, make_handler
    from http.server import ThreadingHTTPServer

    gate = threading.Event()

    def slow_builder():
        gate.wait(5)
        raise RuntimeError("model load exploded")

    holder = ServeState(slow_builder)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(holder))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        # while loading: /search gates with 503
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/search?q=x")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert json.loads(e.read())["status"] == "loading"

        gate.set()
        holder.ready.wait(5)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/status") as r:
            status = json.loads(r.read())
        assert status["model_loaded"] is False
        assert "exploded" in status["error"]
    finally:
        server.shutdown()
