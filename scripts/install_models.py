#!/usr/bin/env python
"""Download sentence-transformers checkpoints into the model-data dir.

Analog of the reference's `just install-models` (/root/reference/
scripts/install_models.sh:7-37), which cloned HF repos and converted weights
to rust_model.ot.  No conversion artifact is needed here — the JAX loader
(perceive_tpu.models.convert) reads the standard sentence-transformers layout
directly — so "install" is just a download into
``model_data/<checkpoint-dir>`` (override with PERCEIVE_TPU_MODEL_DATA).

Usage:
    python scripts/install_models.py                  # the two defaults
    python scripts/install_models.py AllMiniLmL6V2 MsMarcoBertBaseDotV5
    python scripts/install_models.py --all

Requires network access to huggingface.co (not available in airgapped
environments — there, copy a checkpoint directory in by hand).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from perceive_tpu.models.registry import ModelType, model_data_dir  # noqa: E402

DEFAULTS = [ModelType.MSMARCO_BERT_BASE_DOT_V5, ModelType.ALL_MINILM_L6_V2]


def install(mt: ModelType) -> None:
    from huggingface_hub import snapshot_download

    target = model_data_dir() / mt.checkpoint_dir_name
    if (target / "config.json").exists():
        print(f"{mt.value}: already installed at {target}")
        return
    print(f"{mt.value}: downloading sentence-transformers/{mt.checkpoint_dir_name} ...")
    snapshot_download(
        f"sentence-transformers/{mt.checkpoint_dir_name}",
        local_dir=target,
        allow_patterns=[
            "*.json", "*.txt", "*.safetensors", "pytorch_model.bin",
            "1_Pooling/*", "2_Dense/*",
        ],
    )
    print(f"{mt.value}: installed at {target}")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("models", nargs="*", help="model type names (registry values)")
    ap.add_argument("--all", action="store_true", help="install all 8 registry models")
    args = ap.parse_args()

    if args.all:
        targets = list(ModelType)
    elif args.models:
        targets = [ModelType.parse(m) for m in args.models]
    else:
        targets = DEFAULTS

    model_data_dir().mkdir(parents=True, exist_ok=True)
    for mt in targets:
        install(mt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
