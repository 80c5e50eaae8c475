#!/usr/bin/env python
"""Ingest embed-throughput benchmark (BASELINE.md config 2: >=5k docs/sec/chip).

Measures the device-side encode rate through the same double-buffered
dispatch path the ingest pipeline uses (Model.encode_dispatch/materialize):
MiniLM-class tower (384-d, 6-layer, Pallas fused attention on TPU), batch
256, sequence bucket 128 — random weights (throughput does not depend on
weight values) over synthetic token batches so the tokenizer is out of the
measurement (it runs on the host in parallel with the device in production).

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BATCH = 256
SEQ = 128
ITERS = 8
TARGET = 5000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from perceive_tpu.models import EncoderArch, HeadConfig
    from perceive_tpu.models.encoder import init_params, make_encode_fn

    on_tpu = jax.default_backend() == "tpu"
    arch = EncoderArch(
        vocab_size=30522, hidden_size=384, num_layers=6, num_heads=12,
        intermediate_size=1536, max_position_embeddings=512,
    )
    head = HeadConfig(pooling="mean", normalize=True)
    params = init_params(jax.random.PRNGKey(0), arch, head)
    fn = make_encode_fn(
        arch, head, compute_dtype=jnp.bfloat16,
        attention_impl="tpu" if on_tpu else "xla",  # per-bucket routed
    )

    rng = np.random.default_rng(0)
    batches = [
        (
            jnp.asarray(rng.integers(0, arch.vocab_size, (BATCH, SEQ)).astype(np.int32)),
            jnp.asarray(np.ones((BATCH, SEQ), np.int32)),
            jnp.asarray(np.zeros((BATCH, SEQ), np.int32)),
        )
        for _ in range(ITERS + 1)
    ]
    np.asarray(fn(params, *batches[0]))  # compile + warm (materialized)

    t0 = time.perf_counter()
    outs = [fn(params, *b) for b in batches[1:]]  # async dispatch queue
    for o in outs:
        np.asarray(o)  # force real completion
    dt = time.perf_counter() - t0
    dps = ITERS * BATCH / dt

    print(
        json.dumps(
            {
                "metric": f"embed_docs_per_sec_minilm384_b{BATCH}s{SEQ}",
                "value": round(dps, 1),
                "unit": "docs/s",
                "vs_baseline": round(dps / TARGET, 3),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
