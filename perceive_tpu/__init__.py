"""perceive-tpu: a TPU-native personal semantic-search framework.

Capabilities of dimfeld/perceive, re-architected TPU-first:

- host feeder layer: source scanning (filesystem, Chromium history/bookmarks),
  content extraction, change detection, SQLite store (``perceive_tpu.db``,
  ``perceive_tpu.sources``);
- device layer: JAX sentence-embedding encoder with Pallas fused attention
  (``perceive_tpu.models``), an HBM-resident bf16/int8 embedding matrix
  queried by an exact fused matmul + streaming-top-k Pallas kernel
  (``perceive_tpu.ops``, ``perceive_tpu.index``), row-sharded across the ICI
  mesh with per-chip partial top-k merged in-program
  (``perceive_tpu.parallel``);
- surfaces: CLI/REPL (``perceive_tpu.cli``) and an HTTP service
  (``perceive_tpu.serve``).
"""

from .types import (
    Item,
    ItemCompareStrategy,
    ItemMetadata,
    SkipReason,
    Source,
    SourceStatus,
    SourceTypeTag,
)

__version__ = "0.1.0"

__all__ = [
    "Item",
    "ItemMetadata",
    "SkipReason",
    "Source",
    "SourceStatus",
    "SourceTypeTag",
    "ItemCompareStrategy",
    "__version__",
]
