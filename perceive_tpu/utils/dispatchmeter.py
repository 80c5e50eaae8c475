"""Process-wide device-dispatch counter (VERDICT r4 #5).

On a remote-attached topology every device dispatch costs a tunnel round
trip (~40 ms measured here), so dispatches-per-request — not kernel time —
dominates serve latency.  The serve layer already engineered the hot path
down to ONE fused dispatch per uncontended request (encode + sweep +
aux-query-encode in one program; highlight chunks answered from the warmed
cache), but nothing MEASURED it: this counter instruments the few device-
dispatch chokepoints so /metrics can export the real dispatches/request
ratio and a regression (a new code path sneaking in an extra round trip)
shows up on a dashboard instead of in a latency histogram.

Sites counted (each is one compiled-program launch or host<->device
transfer batch):

  searcher._device_scan      one sweep program
  searcher.search_fused      the fused encode+sweep(+aux) program
  model encode dispatch      a batched document/query encode
  highlight chunk encode     a coalesced chunk-score batch

The counter is advisory telemetry: a plain int under a lock, incremented
nanoseconds-scale relative to the dispatches it counts.
"""

from __future__ import annotations

import contextlib
import threading

_lock = threading.Lock()
_counts: dict[str, int] = {"total": 0}
_local = threading.local()


@contextlib.contextmanager
def attributed(site: str):
    """Re-attribute every dispatch on THIS thread to ``site`` while the
    context is active — the serve warmup threads wrap themselves in
    ``attributed("warmup")`` so background compile traffic after readiness
    doesn't pollute the serving dispatches-per-request ratio."""
    prev = getattr(_local, "override", None)
    _local.override = site
    try:
        yield
    finally:
        _local.override = prev


def count(site: str, n: int = 1) -> None:
    """Record ``n`` device dispatches attributed to ``site`` (or to the
    thread's ``attributed`` override when one is active)."""
    site = getattr(_local, "override", None) or site
    with _lock:
        _counts["total"] = _counts.get("total", 0) + n
        _counts[site] = _counts.get(site, 0) + n


def total() -> int:
    with _lock:
        return _counts.get("total", 0)


def snapshot() -> dict[str, int]:
    """Copy of all per-site counters (plus "total")."""
    with _lock:
        return dict(_counts)


def reset() -> None:
    """Tests only: zero every counter."""
    with _lock:
        _counts.clear()
        _counts["total"] = 0
