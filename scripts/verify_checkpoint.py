#!/usr/bin/env python
"""One-command real-checkpoint validation (VERDICT r2 #9).

    make verify-checkpoint          # or: python scripts/verify_checkpoint.py

Chain: download (skipped gracefully when airgapped) -> load through the
perceive-tpu converter/encoder -> golden parity -> optional 10M recall
harness.  Each stage reports PASS/SKIP/FAIL; exit code is non-zero only on
FAIL (an airgapped machine with no checkpoints exits 0 with SKIPs, so CI
can run this unconditionally).

The moment this runs in an environment WITH network access it also writes
``tests/fixtures/real_golden_<checkpoint>.npz`` — torch/transformers-side
embeddings of the probe sentences on the REAL weights — which should be
committed: from then on, airgapped environments can verify real-model
parity without torch or network (reference install flow:
/root/reference/scripts/install_models.sh:7-37).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

SENTENCES = [
    "The TPU sweeps the whole matrix in one fused kernel.",
    "A quick brown fox jumps over the lazy dog",
    "semantic search for your life",
    "Ground control to Major Tom.",
]
FIXTURES = REPO / "tests" / "fixtures"


def _installed():
    from perceive_tpu.models.registry import ModelType, checkpoint_path

    return [(mt, checkpoint_path(mt)) for mt in ModelType if checkpoint_path(mt)]


def stage_download() -> str:
    try:
        import subprocess

        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "install_models.py")],
            capture_output=True, text=True, timeout=1800,
        )
        if r.returncode == 0:
            return "PASS"
        sys.stderr.write(r.stderr[-2000:] + "\n")
        return "SKIP (download failed — airgapped?)"
    except Exception as e:  # noqa: BLE001
        return f"SKIP ({e})"


def stage_torch_golden() -> str:
    """On a machine with torch + real weights: compute torch-side embeddings,
    write the committed-golden fixture, and assert our stack matches."""
    installed = _installed()
    if not installed:
        return "SKIP (no checkpoints under model_data/)"
    try:
        import torch  # noqa: F401
        from transformers import AutoModel, AutoTokenizer
    except Exception:
        return "SKIP (torch/transformers unavailable)"

    from perceive_tpu.models import Model

    for mt, path in installed:
        tok = AutoTokenizer.from_pretrained(str(path))
        ref = AutoModel.from_pretrained(str(path)).eval()
        enc = tok(SENTENCES, padding=True, truncation=True, return_tensors="pt")
        import torch as t

        with t.no_grad():
            out = ref(**enc).last_hidden_state
        mask = enc["attention_mask"].unsqueeze(-1).float()
        want = ((out * mask).sum(1) / mask.sum(1)).numpy()  # mean pooling
        # NOTE: registry models may add a Dense head / normalize — the golden
        # npz stores the RAW mean-pooled tower output; our comparison runs
        # the same tower via encoder internals through Model then compares
        # cosine of the final embeddings against sentence-level similarity
        # structure. For exactness we store our own final embeddings too.
        model = Model.new_pretrained(mt, compute_dtype=np.float32, attention_impl="xla")
        got = model.encode(SENTENCES)

        # cosine structure parity: pairwise similarity matrices agree
        def simmat(x):
            xn = x / np.linalg.norm(x, axis=1, keepdims=True)
            return xn @ xn.T

        diff = np.abs(simmat(got) - simmat(want)).max()
        print(f"  {mt.value}: max pairwise-similarity delta {diff:.5f}")
        if diff > 1e-2:
            return f"FAIL ({mt.value}: similarity structure delta {diff:.4f})"
        # only a PASSING run may bake the committed golden — writing before
        # the check would enshrine broken embeddings as the reference
        fixture = FIXTURES / f"real_golden_{mt.checkpoint_dir_name}.npz"
        if not fixture.exists():
            np.savez(
                fixture,
                sentences=np.array(SENTENCES),
                tower_mean_pooled=want,
                embeddings=got,  # our stack's output on real weights
            )
            print(f"  wrote {fixture} — COMMIT THIS FILE")
    return "PASS"


def stage_committed_golden() -> str:
    """Airgap-safe: verify against committed real-model golden vectors."""
    from perceive_tpu.models import Model
    from perceive_tpu.models.registry import ModelType, checkpoint_path

    fixtures = sorted(FIXTURES.glob("real_golden_*.npz"))
    if not fixtures:
        return "SKIP (no committed real-model goldens yet)"
    checked = 0
    for f in fixtures:
        name = f.stem.replace("real_golden_", "")
        mt = next(
            (m for m in ModelType if m.checkpoint_dir_name == name), None
        )
        if mt is None or checkpoint_path(mt) is None:
            continue
        z = np.load(f, allow_pickle=False)
        model = Model.new_pretrained(mt, compute_dtype=np.float32, attention_impl="xla")
        got = model.encode([str(s) for s in z["sentences"]])
        want = z["embeddings"]
        cos = np.sum(got * want, -1) / (
            np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
        )
        print(f"  {name}: min cosine {cos.min():.6f}")
        if cos.min() <= 0.999:
            return f"FAIL ({name}: cosine {cos.min():.4f} <= 0.999)"
        checked += 1
    return "PASS" if checked else "SKIP (goldens exist but checkpoints not installed)"


def stage_synthetic_golden() -> str:
    """Always-available floor: the committed synthetic ST checkpoint."""
    import subprocess

    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q",
         str(REPO / "tests" / "test_golden_fixture.py")],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    if r.returncode == 0:
        return "PASS"
    sys.stderr.write(r.stdout[-2000:] + "\n")
    return "FAIL (synthetic golden parity)"


def stage_recall(full: bool) -> str:
    if not full:
        return "SKIP (pass --full to run the 10M recall harness on TPU)"
    import subprocess

    r = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "recall_10m.py")],
        text=True, timeout=3600, cwd=str(REPO),
    )
    return "PASS" if r.returncode == 0 else "FAIL (recall harness)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also run the 10M recall harness (TPU, ~minutes)")
    ap.add_argument("--no-download", action="store_true")
    args = ap.parse_args()

    results = {}
    results["download"] = "SKIP (--no-download)" if args.no_download else stage_download()
    results["synthetic_golden"] = stage_synthetic_golden()
    results["torch_golden"] = stage_torch_golden()
    results["committed_golden"] = stage_committed_golden()
    results["recall_10m"] = stage_recall(args.full)

    print("\n== verify-checkpoint ==")
    failed = False
    for k, v in results.items():
        print(f"  {k:18s} {v}")
        failed |= v.startswith("FAIL")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
