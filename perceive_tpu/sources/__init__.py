from .pipeline import (
    EMBED_BATCH_SIZE,
    build_document,
    prune_missing_items,
    scan_source,
)
from .scanner import (
    FoundItem,
    ReadResult,
    ScanItem,
    ScanItemState,
    ScanStats,
    SourceScanner,
    create_scanner,
)

__all__ = [
    "EMBED_BATCH_SIZE",
    "FoundItem",
    "ReadResult",
    "ScanItem",
    "ScanItemState",
    "ScanStats",
    "SourceScanner",
    "build_document",
    "create_scanner",
    "prune_missing_items",
    "scan_source",
]
