"""HBM-resident embedding matrix with an id<->row map.

TPU-native replacement for the reference's per-source HNSW graphs
(/root/reference/crates/perceive-core/search.rs:24-27,81-155): instead of an
approximate graph per source, ONE dense (capacity, dim) matrix lives in device
memory (bf16 by default) holding every embedding row, alongside small device
arrays of per-row source ids and validity.  Queries are exact fused
matmul+top-k scans (see perceive_tpu.index.searcher / perceive_tpu.ops), so
recall@10 is parity-by-construction; source filtering is a row mask, not a
graph fan-out.

Incremental updates the HNSW couldn't do in place: rows are appended or
overwritten by item id, deletions/hides are tombstones (valid=False), and the
matrix doubles capacity by reallocation when full.  Row padding keeps the row
count a multiple of 512 so kernel tiles never see ragged edges.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

ROW_ALIGN = 512
LANE_ALIGN = 128  # last-dim tile width on TPU

# Storage-dtype sentinel for the packed 4-bit mode: two dims per byte in a
# TRANSPOSED (D/2, capacity) uint8 device array (see ops/topk.py int4
# section).  0.5 bytes/dim makes the bandwidth-bound exact scan ~4x faster
# than bf16 at the cost of approximate scores — the Searcher reranks in f32.
INT4 = "int4"

# Coarse-to-fine 2-bit tier (ops/topk.py int2 section): the PRIMARY device
# array packs four dims per byte, (D/4, capacity) uint8 transposed, and a
# COMPANION fine matrix (+ its scales) rides along for the in-jit fine
# rerank of the coarse candidates.  The companion is int8 (1 byte/dim,
# transposed (D, capacity) — the THROUGHPUT companion: batch sweeps of it
# run the single-dot int8t kernels at int8-tier QPS, ops/topk.py int8t
# section) while coarse+fine fit the device budget, else packed int4
# (0.5 bytes/dim, the capacity companion).  Either way the single-query
# sweep reads only the 0.25 bytes/dim coarse matrix — the companion is
# touched for a few thousand gathered columns per query (and for batch /
# full-sweep escalation paths).  See int2_fine_bits.
INT2 = "int2"

# Row keys are (item_id, chunk_idx) packed as item_id * CHUNK_STRIDE +
# chunk_idx, so one item's chunk vectors group under integer division.
CHUNK_STRIDE = 4096


# -- prefix sweep ------------------------------------------------------------
# Device arrays are CAPACITY-sized, but live rows occupy the prefix
# [0, rows): appends go at the high-water mark and tombstone reuse fills
# holes below it.  Queries therefore only need to sweep a round-up of the
# high-water mark, not the whole capacity — power-of-2 capacity growth
# leaves an average ~40% dead-row overhang that the sweep would otherwise
# pay on every single query (round-3 review).  The round-up follows a
# geometric ladder (ratio 9/8) so corpus growth causes O(log n) kernel
# recompiles instead of one per 512-row step.
#
# _SWEEP_ALIGN is the lcm of every kernel row tile, INCLUDING the int2
# scores kernel's fat 12288 tile (2^12 * 3) that power-of-2 capacities can
# never hit — ladder values are always fat-tile-divisible.
_SWEEP_ALIGN = 24576  # lcm(12288, 8192, ..., 512)
_SWEEP_MIN = 98304  # 4 * _SWEEP_ALIGN; below this just sweep the capacity


def sweep_rows_for(hwm: int, capacity: int) -> int:
    """Rows a query sweep must cover: the smallest ladder value >= the
    live-row high-water mark ``hwm`` (<= 12.5% overhang), clamped to the
    capacity.  Small matrices sweep the whole capacity (sub-ms anyway,
    and it keeps the tiny-corpus test matrix of compiled programs to 1)."""
    if capacity <= _SWEEP_MIN or hwm >= capacity:
        return capacity
    v = _SWEEP_MIN
    while v < hwm:
        v = _round_up(v + v // 8, _SWEEP_ALIGN)
    return min(v, capacity)


def chunk_key(item_id: int, chunk_idx: int = 0) -> int:
    if not 0 <= chunk_idx < CHUNK_STRIDE:
        # out-of-range indices would silently key into the NEXT item's
        # group; the ingest pipeline caps windows (MAX_CHUNKS_PER_DOC), so
        # reaching this is a caller bug — fail loud, never corrupt
        raise ValueError(f"chunk_idx {chunk_idx} outside [0, {CHUNK_STRIDE})")
    return item_id * CHUNK_STRIDE + chunk_idx


def key_item(key: int) -> int:
    return key // CHUNK_STRIDE


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def auto_matrix_dtype(n_rows: int, padded_dim: int = 384):
    """Storage dtype for a corpus of ``n_rows`` vectors of ``padded_dim``
    dims — the default tier selection (VERDICT r2 #2: the latency tier
    must be the default, not an opt-in env var).

    The exact scan is HBM-bandwidth-bound, so BYTES per row IS the p50:
    at ~735 GB/s a bf16 384-d sweep costs ~1 ms per million rows.  Every
    threshold below is a bytes crossover measured at 384-d; a wider
    model (the default MsMarcoBertBaseDotV5 embeds at 768-d) reaches the
    same bytes at proportionally fewer rows, so the row count scales by
    padded_dim/384 before the comparison.  The rule picks the *least*
    quantization that keeps a full sweep under the ~2 ms latency target
    (BASELINE.md):

      <= 1.5M rows   bfloat16   (sweep <= ~1.6 ms; no quantization noise)
      <= 4M rows     int8       (1 byte/dim; sweep <= ~2.1 ms; exact after
                                 the built-in f32 rerank)
      <= 24M rows    int2       (coarse-to-fine: 0.25-byte/dim sweep +
                                 in-jit fine rerank; 10M rows 2.65 ms
                                 measured at candidate-recall 0.9996,
                                 benchmarks/recall_int2.py — beats the
                                 int4 sweep's 3.1 ms; the tier stores
                                 coarse int2 AND a fine companion, int8
                                 while HBM allows else int4 —
                                 int2_fine_bits)
      >  24M rows    int4       (0.5 bytes/dim, the leanest device tier —
                                 capacity wins over the int2 latency edge
                                 once 0.75 byte/dim pressures HBM; 40M
                                 validated on hardware, BENCH_NOTES)

    Every tier returns exact top-k: quantized tiers over-fetch candidates,
    rerank them in f32 against the host mirror, and escalate the fetch when
    the floor can't prove exactness (index/searcher._scan).
    """
    eff = n_rows * max(padded_dim, 1) / 384.0
    if eff <= 1_500_000:
        return jnp.bfloat16
    if eff <= 4_000_000:
        return jnp.int8
    if eff <= 24_000_000:
        return INT2
    return INT4


def _int2_fine_int8_budget() -> int:
    """Device bytes the int2 tier's coarse+fine pair may occupy before the
    fine companion drops from int8 to packed int4.

    PERCEIVE_TPU_INT2_FINE_INT8_GB overrides; otherwise ~64% of the
    device's reported HBM (the fraction a 10 GB budget is of the bench
    chip's 15.75 GB — leaves room for scales/ids/score-buffer/encoder
    params and restage transients), falling back to 10 GB flat when the
    runtime exposes no memory stats (the tunnel backend doesn't)."""
    env = os.environ.get("PERCEIVE_TPU_INT2_FINE_INT8_GB")
    if env is not None:
        try:
            return int(float(env) * 2**30)
        except ValueError:
            pass
    try:
        stats = jax.devices()[0].memory_stats()
        limit = (stats or {}).get("bytes_limit")
        if limit:
            return int(0.64 * limit)
    except Exception:
        pass
    return 10 * 2**30


def int2_fine_bits(capacity: int, padded_dim: int, row_shards: int = 1) -> int:
    """Fine-companion width for an int2-tier matrix of this device shape:
    8 (int8 transposed — int8-class batch QPS and lower-noise fine
    rescoring) when coarse (0.25 B/dim) + fine (1 B/dim) fit the budget,
    else 4 (packed int4, the capacity companion).  PERCEIVE_TPU_INT2_FINE
    = int8 | int4 overrides.  Derived from CAPACITY, not live rows, so the
    answer only changes on growth — which always forces a full restage.
    ``row_shards`` is the number of devices the rows are sharded over
    (EmbeddingMatrix.row_shards): the budget is PER-CHIP HBM, so a mesh
    matrix compares its per-chip slice, not the global bytes."""
    env = os.environ.get("PERCEIVE_TPU_INT2_FINE", "auto").lower()
    if env in ("int8", "8"):
        return 8
    if env in ("int4", "4"):
        return 4
    per_chip = -(-capacity // max(row_shards, 1))
    if per_chip * padded_dim * 1.25 <= _int2_fine_int8_budget():
        return 8
    return 4


def _scatter_rows_impl(matrix, rows, vals):
    return matrix.at[rows].set(vals)


# donation lets XLA update the (potentially GBs) matrix in place; ONE jitted
# callable serves every shape/dtype (jit caches per signature) — the 2-D
# vector scatter and the 1-D scales/source-ids scatters share it
_scatter_rows = jax.jit(_scatter_rows_impl, donate_argnums=(0,))
_scatter_vals = _scatter_rows


def _scatter_cols_impl(matrix, cols, vals):
    return matrix.at[:, cols].set(vals)


# column scatter for the transposed int4 packed matrix
_scatter_cols = jax.jit(_scatter_cols_impl, donate_argnums=(0,))


def _donated_row_update_impl(buf, chunk, lo):
    return jax.lax.dynamic_update_slice(buf, chunk, (lo, jnp.int32(0)))


# streams host chunks into the device matrix in place (chunked full upload,
# _chunked_upload): donation keeps device peak at buffer+chunk, and `lo`
# rides as a traced scalar so every interior chunk shares one compilation
_donated_row_update = jax.jit(_donated_row_update_impl, donate_argnums=(0,))


def _is_sharding(dev) -> bool:
    try:
        from jax.sharding import Sharding

        return isinstance(dev, Sharding)
    except Exception:
        return False


def serialize_embedding(vec: np.ndarray) -> bytes:
    """f32 little-endian BLOB, byte-compatible with the reference store
    (search.rs:281-287)."""
    return np.ascontiguousarray(vec, dtype="<f4").tobytes()


def deserialize_embedding(blob: bytes) -> np.ndarray:
    """(reference search.rs:289-294)"""
    return np.frombuffer(blob, dtype="<f4").copy()


# Bulk mirror-copy chunk (bytes): small enough that MADV_WILLNEED readahead
# of chunk i+1 fits comfortably in page cache while chunk i copies, large
# enough that the per-chunk Python overhead is noise (10M x 384 f32 -> ~230
# chunks).
_MIRROR_COPY_CHUNK_BYTES = 64 * 2**20


def _mem_available_bytes() -> Optional[int]:
    """Linux MemAvailable (the kernel's estimate of allocatable RAM without
    swapping), or None where /proc/meminfo is absent."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except (OSError, ValueError, IndexError):
        pass
    return None


def _mirror_ram_budget() -> int:
    """Bytes the host mirror may hold in RAM before spilling to a
    memory-mapped file (PERCEIVE_TPU_MIRROR_RAM_GB overrides).

    Default (round 5): half of MemAvailable, clamped to [8, 64] GiB.  The
    old flat 8 GiB default spilled a 10M x 384 f32 mirror (15.4 GB) to a
    file-backed memmap on hosts with 100+ GB free, doubling the adopt
    pass's disk traffic (15.4 GB of page-fault writes on top of the
    snapshot reads) — the measured "mirror-bound" startup wall
    (BENCH_NOTES round-4 snapshot-adopt section).  Spilling remains the
    behavior wherever the mirror genuinely exceeds free RAM."""
    env = os.environ.get("PERCEIVE_TPU_MIRROR_RAM_GB")
    if env is not None:
        try:
            return int(float(env) * 2**30)
        except ValueError:
            pass
    avail = _mem_available_bytes()
    if avail is None:
        return 8 * 2**30
    return max(8 * 2**30, min(avail // 2, 64 * 2**30))


def _mirror_spill_dir() -> Optional[str]:
    """Directory for spilled mirror files (PERCEIVE_TPU_MIRROR_DIR, default
    the app data dir).  The system temp dir is commonly tmpfs (RAM-backed)
    on Linux — spilling there would charge the mirror against the very host
    RAM the spill exists to relieve (round-3 review)."""
    env = os.environ.get("PERCEIVE_TPU_MIRROR_DIR")
    if env:
        os.makedirs(env, exist_ok=True)
        return env
    try:
        from ..paths import data_dir

        return str(data_dir())
    except OSError:
        return None  # unwritable home: fall back to the tempfile default


def _mirror_np_dtype():
    """Element dtype for the host mirror (PERCEIVE_TPU_MIRROR_DTYPE).

    float32 (default) keeps the quantized-tier rerank exact; bfloat16
    halves mirror bytes at bf16-rerank precision — the same precision as
    the bf16 device tier the recall baseline already calls parity
    (BASELINE.md recall row)."""
    name = os.environ.get("PERCEIVE_TPU_MIRROR_DTYPE", "float32").lower()
    if name in ("bf16", "bfloat16"):
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(np.float32)


class HostMirror:
    """Host-side mirror of the vector matrix: rerank, growth, and snapshots
    all read through here.

    Round 2 stored a plain (capacity, padded_dim) f32 ndarray, capping the
    corpus at host RAM — 61 GB at the 40M-row int4 capacity the device can
    hold (VERDICT r2 #3).  Now the array starts in RAM and spills to a
    memory-mapped file once it would exceed the RAM budget, so host memory
    holds only the touched pages (the OS evicts under pressure) and corpus
    scale is capped by HBM again.  Growth of a spilled mirror extends the
    file in place (ftruncate + remap) — no copy.  Element dtype is f32 by
    default (exact rerank); bfloat16 halves bytes (``_mirror_np_dtype``).
    """

    def __init__(
        self,
        capacity: int,
        width: int,
        *,
        dtype: Optional[np.dtype] = None,
        ram_budget: Optional[int] = None,
        dir: Optional[str] = None,
    ):
        self.width = width
        self.dtype = np.dtype(dtype) if dtype is not None else _mirror_np_dtype()
        self.ram_budget = ram_budget if ram_budget is not None else _mirror_ram_budget()
        self.dir = dir
        self.path: Optional[str] = None  # set once spilled to disk
        self.arr = self._alloc(capacity)

    @property
    def is_mmap(self) -> bool:
        return self.path is not None

    def _nbytes(self, capacity: int) -> int:
        return capacity * self.width * self.dtype.itemsize

    def _alloc(self, capacity: int) -> np.ndarray:
        if self._nbytes(capacity) <= self.ram_budget:
            return np.zeros((capacity, self.width), dtype=self.dtype)
        import tempfile

        fd, path = tempfile.mkstemp(
            suffix=".mirror", dir=self.dir if self.dir is not None else _mirror_spill_dir()
        )
        os.close(fd)
        self.path = path
        return np.memmap(path, dtype=self.dtype, mode="w+", shape=(capacity, self.width))

    def grow(self, new_cap: int) -> None:
        """Grow to ``new_cap`` rows with an ATOMIC publish: the new array is
        fully built (old data copied / file extended and remapped) before
        ``self.arr`` is reassigned — lock-free readers (the rerank path
        reads without the matrix lock) always see either the complete old
        array or the complete new one, never a half-copied or missing one.
        Rows beyond the old capacity are only handed out under the matrix
        lock after grow returns, so a stale reference is still consistent."""
        old = self.arr
        old_cap = old.shape[0]
        if self.path is None:
            if self._nbytes(new_cap) <= self.ram_budget:
                new = np.zeros((new_cap, self.width), dtype=self.dtype)
            else:
                new = self._alloc(new_cap)  # spill: RAM -> file-backed
            new[:old_cap] = old
            self.arr = new
            return
        # already file-backed: extend the file in place (growing a file
        # under a live mapping is safe — the old mapping still covers its
        # range), then swap in the larger mapping
        old.flush()
        os.truncate(self.path, self._nbytes(new_cap))
        self.arr = np.memmap(
            self.path, dtype=self.dtype, mode="r+", shape=(new_cap, self.width)
        )

    def read_f32(self, rows, ncols: Optional[int] = None) -> np.ndarray:
        """Rows (fancy index or slice) as f32, first ``ncols`` columns.

        Always a COPY, never a view: slice reads of an f32 mirror would
        otherwise alias the live buffer, and callers (snapshot streaming,
        retier stats) serialize the result OUTSIDE the matrix lock — a
        concurrent upsert overwriting a row mid-serialization would publish
        a torn half-old/half-new vector (review r3; overwrites don't bump
        reuse_gen, so the snapshot publish check cannot catch it)."""
        sel = self.arr[rows] if ncols is None else self.arr[rows, :ncols]
        return np.array(sel, dtype=np.float32, copy=True)

    def write(self, rows, vals_f32: np.ndarray, dim: int) -> None:
        """Store f32 vectors (first ``dim`` columns; the pad tail stays 0)."""
        self.arr[rows, :dim] = vals_f32  # downcasts if the mirror is bf16
        if self.width > dim:
            self.arr[rows, dim:] = 0.0

    def flush(self) -> None:
        if self.path is not None:
            self.arr.flush()

    def remap(self) -> None:
        """Flush and re-map a file-backed mirror, dropping the page
        residency accumulated during a bulk build (the mirror's RSS
        contribution returns to ~0; subsequent reads fault in only the
        pages they touch — e.g. rerank candidates).  Atomic swap, same
        lock-free-reader contract as grow."""
        if self.path is None:
            return
        shape = self.arr.shape
        self.arr.flush()
        self.arr = np.memmap(self.path, dtype=self.dtype, mode="r+", shape=shape)

    def close(self) -> None:
        if self.path is not None:
            try:
                del self.arr
                os.unlink(self.path)
            except OSError:
                pass
            self.path = None

    def __del__(self):  # best-effort temp-file cleanup
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


class EmbeddingMatrix:
    """Mutable device-resident vector store.

    Host-side state: ``row_of`` (item_id -> row), ``item_ids``/``source_ids``
    (row -> ids).  Device-side state: ``device_vectors`` (capacity, dim)
    storage dtype, ``device_source_ids`` (capacity,) int32 with -1 for
    invalid rows (tombstones and unallocated tail).

    All mutation is host-buffered and applied in batches; ``sync()`` uploads
    pending rows with one device_put per flush rather than per row.
    """

    def __init__(
        self,
        dim: int,
        *,
        dtype: jnp.dtype = jnp.bfloat16,
        capacity: int = 4096,
        device=None,  # jax.Device or jax.sharding.Sharding (mesh placement)
        ids_device=None,  # separate placement for the 1D per-row arrays
        row_align: int = ROW_ALIGN,
    ):
        self.dim = dim
        self.padded_dim = _round_up(dim, LANE_ALIGN)
        self.dtype = dtype
        self.row_align = row_align
        self.capacity = _round_up(max(capacity, row_align), row_align)
        self.device = device
        self.ids_device = ids_device if ids_device is not None else device
        self._lock = threading.RLock()
        # serializes save_snapshot as a whole (never held by queries)
        self._snapshot_io_lock = threading.Lock()

        self.rows = 0  # high-water mark of allocated rows
        # tombstoned rows available for reuse — without this, rebuild/churn
        # grows capacity without bound (ADVICE r1: matrix.py:275)
        self._free: list[int] = []
        # bumped whenever a freed row is RE-allocated to a new key: a search
        # that captured device arrays before the reuse could decode that row
        # as the new item with the old item's score.  Searchers snapshot this
        # before a sweep and retry when it moved (index/searcher._scan docs).
        self.reuse_gen = 0
        # bumped on ANY logical content change (upsert/remove/clear/retier):
        # the invalidation key for result caches above the searcher — a
        # cached (query -> hits) pair is valid iff mutation_gen is unchanged
        # (serve/executor query cache, round 3)
        self.mutation_gen = 0
        # high-water quantization stats for the rerank escalation margin
        # (index/searcher._scan): the largest per-row quantization scale and
        # the largest row L2 norm ever upserted.  High-water (never lowered
        # on remove) keeps them conservative.
        self.scale_hw = 0.0
        self.norm_hw = 0.0
        # int2 tier only: whether the coarse pass may serve queries.  Set by
        # the Searcher's corpus self-audit (searcher.audit_coarse): on
        # corpora whose score ties are denser than the int2 grid can rank
        # (topical clusters), the coarse pass silently loses top-k rows and
        # no escalation margin can detect it (BENCH_NOTES round-3,
        # clustered2) — False reroutes every query to the fine-companion sweep.
        # The coarse matrix stays resident so a later re-audit (corpus
        # drift) can re-enable it without restaging.
        self.coarse_trusted = True
        # Coarse SELECTION variant ("approx" = TPU PartialReduce, the fast
        # default; "exact" = hierarchical two-top_k).  The searcher's
        # self-audit measures the corpus's coarse-rank displacement and
        # falls back to "exact" where bin-collision misses would breach
        # the recall bar (dense score ties; searcher.audit_coarse).
        self.coarse_select = "approx"
        # Adaptive coarse fetch depth (0 = the ops.topk.INT2_COARSE_FETCH
        # default).  The self-audit measures the coarse-rank displacement
        # of reference top-k rows on THIS corpus and shallows the fetch
        # where the tail shows wide margin (VERDICT r3 #2c) — selection +
        # fine-phase cost scale with the fetch, the escalation floor
        # covers the residual exactly as at the default depth.
        self.coarse_fetch = 0
        self.row_of: dict[int, int] = {}
        # key-group index: item id -> set of chunk keys currently stored
        self.groups: dict[int, set[int]] = {}
        # number of groups holding >1 chunk key (searchers over-fetch
        # candidates when any document is chunk-embedded; maintained here so
        # queries never walk the groups dict)
        self.multi_chunk_groups = 0
        self.item_ids = np.full(self.capacity, -1, dtype=np.int64)
        self.source_ids = np.full(self.capacity, -1, dtype=np.int32)
        # host mirror of vectors so growth/snapshots/rerank never read device;
        # spills from RAM to a memory-mapped file at scale (HostMirror)
        self._mirror = HostMirror(self.capacity, self.padded_dim)
        self._dirty = True  # full re-upload needed (first sync / growth)
        self._dirty_rows: set[int] = set()  # incremental row updates
        # rows changed / keys removed since the last FULL snapshot
        # (delta-snapshot support); _delta_rows None = too much churn
        # accumulated, next snapshot must be a full rewrite
        self._delta_rows: Optional[set[int]] = set()
        self._delta_removed: set[int] = set()
        self._device_vectors = None
        self._device_source_ids = None
        self._device_scales = None  # (capacity,) f32 per-row scales, int8 mode
        # int2 tier only: the companion fine matrix (int8 or packed int4,
        # int2_fine_bits) + its scales
        self._device_fine = None
        self._device_fine_scales = None

    @property
    def packed4(self) -> bool:
        return isinstance(self.dtype, str) and self.dtype == INT4

    @property
    def packed2(self) -> bool:
        return isinstance(self.dtype, str) and self.dtype == INT2

    @property
    def quantized(self) -> bool:
        return self.packed4 or self.packed2 or self.dtype == jnp.int8

    @property
    def quant_bits(self) -> int:
        """Bits per stored dim on the sweep path: 2 (coarse-to-fine),
        4 (packed), 8 (int8), 0 (not quantized)."""
        if self.packed2:
            return 2
        return 4 if self.packed4 else (8 if self.dtype == jnp.int8 else 0)

    @property
    def row_shards(self) -> int:
        """Devices the row axis is sharded over (1 for a single-chip
        matrix) — the divisor that turns global capacity into the
        per-chip bytes HBM budgets actually constrain."""
        try:
            from jax.sharding import NamedSharding

            if isinstance(self.device, NamedSharding):
                return self.device.mesh.size
        except Exception:
            pass
        return 1

    @property
    def fine_bits(self) -> int:
        """Int2 tier only: width of the fine companion (8 or 4); 0 for
        every other tier.  Reports the STORED companion when one exists —
        an env flip mid-session must not desync routing/scatter decisions
        from the bytes actually on device; the int2_fine_bits policy is
        consulted only when (re)staging builds fresh arrays."""
        if not self.packed2:
            return 0
        df = self._device_fine
        if df is not None:
            return 8 if df.dtype == jnp.int8 else 4
        return int2_fine_bits(self.capacity, self.padded_dim, self.row_shards)

    def _quantize(self, rows_f32: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per-row symmetric int8: scale = max|v|/127 (min-clamped so all-zero
        rows stay representable); returns (int8 values, f32 scales)."""
        scales = np.maximum(np.abs(rows_f32).max(axis=1), 1e-12) / 127.0
        q = np.clip(np.rint(rows_f32 / scales[:, None]), -127, 127).astype(np.int8)
        return q, scales.astype(np.float32)

    def _quantize4(self, rows_f32: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per-row symmetric int4, packed 2 dims/byte: scale = max|v|/7; byte
        j holds dim j in the LOW nibble biased +8 (range [1, 15]) and dim
        j + padded_dim/2 in the HIGH nibble as two's complement — the layout
        the algebraic-unpack kernel expects (ops/topk.py int4 section).
        Returns ((n, D/2) uint8, (n,) f32 scales) — the device array stores
        the TRANSPOSE."""
        scales = np.maximum(np.abs(rows_f32).max(axis=1), 1e-12) / 7.0
        q = np.clip(np.rint(rows_f32 / scales[:, None]), -7, 7).astype(np.int8)
        d2 = self.padded_dim // 2
        lo = (q[:, :d2] + 8).astype(np.uint8)
        hi = (q[:, d2:] & 15).astype(np.uint8)  # two's complement nibble
        packed = lo | (hi << 4)
        return packed, scales.astype(np.float32)

    def _quantize2(self, rows_f32: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per-row uniform symmetric 2-bit, packed 4 dims/byte: every dim
        snaps to the 4-level grid {-3,-1,1,3} * s with s = max(rms/2, eps)
        (the MSE-optimal uniform scale for gaussian-ish dims; measured MSE
        0.119 * var).  Byte j packs dims j, j+D/4, j+2D/4, j+3D/4 — planes
        0-2 as the raw crumb c (level = 2c-3), plane 3 as t = c-2 two's
        complement, the layout ops/topk.py's algebraic int2 kernel expects.
        Returns ((n, D/4) uint8, (n,) f32 scales); the device stores the
        TRANSPOSE."""
        d = self.dim
        scales = np.maximum(
            np.sqrt(np.mean(rows_f32[:, :d] ** 2, axis=1)) / 2.0, 1e-12
        )
        # pad dims quantize to a nonzero level (the grid has no 0), which is
        # harmless: queries are zero-padded, so pad lanes never score
        c = np.clip(
            np.round((rows_f32 / scales[:, None] + 3.0) / 2.0), 0, 3
        ).astype(np.uint8)
        d4 = self.padded_dim // 4
        t3 = (c[:, 3 * d4 :] - 2) & 3
        packed = (
            c[:, :d4]
            | (c[:, d4 : 2 * d4] << 2)
            | (c[:, 2 * d4 : 3 * d4] << 4)
            | (t3 << 6)
        )
        return packed, scales.astype(np.float32)

    # -- device views -------------------------------------------------------

    def _vectors_device(self):
        """Placement for the vectors array.  The packed int4/int2 matrices
        are stored TRANSPOSED (D/2 or D/4, capacity), so a row sharding like
        P(rows, None) must become P(None, rows) — metadata arrays keep the
        original spec."""
        if not (self.packed4 or self.packed2):
            return self.device
        try:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if isinstance(self.device, NamedSharding):
                spec = tuple(self.device.spec)
                return NamedSharding(self.device.mesh, P(*reversed(spec)))
        except Exception:
            pass
        return self.device

    def sync(self) -> None:
        """Upload host state to the device if anything changed.

        Full uploads cast to the storage dtype on the host first (halves the
        PCIe/ICI bytes for bf16).  Small deltas scatter in place on device so
        steady-state ingest is O(batch), not O(corpus).
        """
        with self._lock:
            if not self._dirty and not self._dirty_rows:
                return
            full = (
                self._dirty
                or self._device_vectors is None
                or len(self._dirty_rows) * 4 > self.rows
            )
            if full:
                if self.packed2:
                    self._stage_full_int2()
                else:
                    staged = self._stage_full()
                    if staged is not None:  # None: _chunked_upload placed it
                        self._device_vectors = jax.device_put(
                            staged, self._vectors_device()
                        )
                self._device_source_ids = jax.device_put(
                    self.source_ids, self.ids_device
                )
                if self._mirror.path is not None:
                    # a full restage touched every mirror page; for a
                    # file-backed (spilled) mirror, drop that residency now
                    # so RSS returns to ~0 and later reads (rerank
                    # candidates) fault in only what they touch (review r3:
                    # remap existed but nothing production called it)
                    self._mirror.remap()
            else:
                rows = np.fromiter(self._dirty_rows, dtype=np.int32)
                vals = self._mirror.read_f32(rows)
                if self.packed2:
                    packed, scales = self._quantize2(vals)
                    self._device_scales = _scatter_vals(
                        self._device_scales, jnp.asarray(rows), jnp.asarray(scales)
                    )
                    self._device_vectors = _scatter_cols(
                        self._device_vectors,
                        jnp.asarray(rows),
                        jnp.asarray(np.ascontiguousarray(packed.T)),
                    )
                    if self.fine_bits == 8:
                        fine, fscales = self._quantize(vals)
                    else:
                        fine, fscales = self._quantize4(vals)
                    self._device_fine_scales = _scatter_vals(
                        self._device_fine_scales, jnp.asarray(rows), jnp.asarray(fscales)
                    )
                    self._device_fine = _scatter_cols(
                        self._device_fine,
                        jnp.asarray(rows),
                        jnp.asarray(np.ascontiguousarray(fine.T)),
                    )
                elif self.packed4:
                    packed, scales = self._quantize4(vals)
                    self._device_scales = _scatter_vals(
                        self._device_scales, jnp.asarray(rows), jnp.asarray(scales)
                    )
                    self._device_vectors = _scatter_cols(
                        self._device_vectors,
                        jnp.asarray(rows),
                        jnp.asarray(np.ascontiguousarray(packed.T)),
                    )
                else:
                    if self.quantized:
                        vals, scales = self._quantize(vals)
                        self._device_scales = _scatter_vals(
                            self._device_scales, jnp.asarray(rows), jnp.asarray(scales)
                        )
                    else:
                        vals = vals.astype(jax.dtypes.canonicalize_dtype(self.dtype))
                    self._device_vectors = _scatter_rows(
                        self._device_vectors, jnp.asarray(rows), jnp.asarray(vals)
                    )
                self._device_source_ids = _scatter_vals(
                    self._device_source_ids,
                    jnp.asarray(rows),
                    jnp.asarray(self.source_ids[rows]),
                )
            self._dirty = False
            self._dirty_rows.clear()

    # chunk size for full-upload staging and snapshot writes: ~100 MB of f32
    # at 384-d per chunk keeps peak temporaries and per-lock-hold copies small
    _SYNC_CHUNK_ROWS = 65_536

    def _stage_full_int2(self) -> None:
        """Full upload for the int2 tier: quantizes the mirror into BOTH the
        coarse packed-2-bit matrix and the fine companion, in row
        chunks (same bounded-temporary discipline as _stage_full)."""
        cap = self.capacity
        chunk = self._SYNC_CHUNK_ROWS
        d4 = self.padded_dim // 4
        coarse = np.empty((d4, cap), dtype=np.uint8)
        cscales = np.empty((cap,), np.float32)
        # the fine companion is TRANSPOSED — the candidate column gather is
        # ~free that way (probe_int2c; a row-major layout's unaligned rows
        # gathered ~200x slower).  int8 (D, cap) when the budget allows
        # (int2_fine_bits: batch sweeps then run the int8t kernels at
        # int8-tier QPS), else packed int4 (D/2, cap), byte-identical to
        # the int4 tier's matrix.  A full restage consults the POLICY (not
        # the fine_bits property, which reports whatever is currently
        # stored): growth or an env change re-decides here.  Per-chip
        # bytes on a mesh (row_shards).
        fb = int2_fine_bits(cap, self.padded_dim, self.row_shards)
        if fb == 8:
            fine = np.empty((self.padded_dim, cap), dtype=np.int8)
        else:
            fine = np.empty((self.padded_dim // 2, cap), dtype=np.uint8)
        fscales = np.empty((cap,), np.float32)
        for lo in range(0, cap, chunk):
            hi = min(lo + chunk, cap)
            vals = self._mirror.read_f32(slice(lo, hi))
            p2, s2 = self._quantize2(vals)
            coarse[:, lo:hi] = p2.T
            cscales[lo:hi] = s2
            pf, sf = self._quantize(vals) if fb == 8 else self._quantize4(vals)
            fine[:, lo:hi] = pf.T
            fscales[lo:hi] = sf
        dev = self._vectors_device()
        self._device_vectors = jax.device_put(coarse, dev)
        self._device_scales = jax.device_put(cscales, self.ids_device)
        self._device_fine = jax.device_put(fine, dev)
        self._device_fine_scales = jax.device_put(fscales, self.ids_device)

    def _stage_full(self) -> Optional[np.ndarray]:
        """Host staging array in the storage dtype for a full device upload,
        built in row chunks so the upload never materializes a whole-corpus
        f32 temporary (61 GB at 40M x 384 — the mirror may be bf16 or
        memory-mapped; staging is storage-dtype bytes only).  Sets
        ``_device_scales`` for quantized modes."""
        cap = self.capacity
        chunk = self._SYNC_CHUNK_ROWS
        if self.packed4:
            d2 = self.padded_dim // 2
            staged = np.empty((d2, cap), dtype=np.uint8)  # transposed layout
            scales = np.empty((cap,), np.float32)
            for lo in range(0, cap, chunk):
                hi = min(lo + chunk, cap)
                p, s = self._quantize4(self._mirror.read_f32(slice(lo, hi)))
                staged[:, lo:hi] = p.T
                scales[lo:hi] = s
            self._device_scales = jax.device_put(scales, self.ids_device)
            return staged
        if self.quantized:
            staged = np.empty((cap, self.padded_dim), dtype=np.int8)
            scales = np.empty((cap,), np.float32)
            for lo in range(0, cap, chunk):
                hi = min(lo + chunk, cap)
                q, s = self._quantize(self._mirror.read_f32(slice(lo, hi)))
                staged[lo:hi] = q
                scales[lo:hi] = s
            self._device_scales = jax.device_put(scales, self.ids_device)
            return staged
        canon = np.dtype(jax.dtypes.canonicalize_dtype(self.dtype))
        # ALWAYS a private staging copy, even when the mirror dtype already
        # matches the storage dtype: jax.device_put can zero-copy ALIAS a
        # suitably-aligned numpy buffer on the CPU backend, and later
        # in-place mirror writes (upsert overwriting a live row, compact's
        # arr[dsts] = arr[srcs]) would then mutate the device operand of
        # in-flight kernels — torn scores with no reuse_gen retry to catch
        # them (review r3).  Equal-dtype full syncs normally only occur on
        # small (non-quantized-tier) corpora under auto-retier; when the
        # user PINS f32/bf16 on a large corpus, a whole-corpus staging copy
        # would double peak host memory, so route big single-device uploads
        # through the chunked donated-update path instead (review r4)
        if (
            cap * self.padded_dim * canon.itemsize > self._CHUNKED_UPLOAD_BYTES
            and not _is_sharding(self._vectors_device())
        ):
            self._device_vectors = self._chunked_upload(canon)
            return None
        staged = np.empty((cap, self.padded_dim), dtype=canon)
        for lo in range(0, cap, chunk):
            hi = min(lo + chunk, cap)
            staged[lo:hi] = self._mirror.arr[lo:hi].astype(canon, copy=False)
        return staged

    # Above this, an unquantized full sync builds the device matrix by
    # streaming ~100 MB host chunks into a donated dynamic_update_slice
    # (in-place on TPU): host peak stays one chunk instead of a second
    # whole-corpus copy.  Sharded targets keep the one-shot staged
    # device_put — per-chunk puts can't address a NamedSharding slice.
    _CHUNKED_UPLOAD_BYTES = 1 << 30

    def _chunked_upload(self, canon: np.dtype) -> jax.Array:
        dev = self._vectors_device()
        cap = self.capacity
        chunk = self._SYNC_CHUNK_ROWS
        buf = jax.device_put(jnp.zeros((cap, self.padded_dim), dtype=canon), dev)
        for lo in range(0, cap, chunk):
            hi = min(lo + chunk, cap)
            # copy=True: a fresh buffer per chunk so the (possibly async)
            # transfer can never observe a later in-place mirror write
            tmp = np.ascontiguousarray(self._mirror.arr[lo:hi].astype(canon))
            buf = _donated_row_update(buf, jax.device_put(tmp, dev), np.int32(lo))
        return buf

    @property
    def device_vectors(self) -> jax.Array:
        self.sync()
        return self._device_vectors

    @property
    def device_source_ids(self) -> jax.Array:
        self.sync()
        return self._device_source_ids

    @property
    def device_scales(self):
        """(capacity,) f32 per-row scales (int8 mode only, else None)."""
        self.sync()
        return self._device_scales

    def device_view(self):
        """Atomically capture (vectors, source_ids, scales) under the lock.

        Queries MUST use this instead of the individual properties when
        ingest may run concurrently: each property re-syncs, and an
        incremental sync donates (invalidates) the previous device arrays —
        capturing one property then another lets a concurrent upsert delete
        the first array before the kernel launches.

        Concurrent searchers additionally hold ``self._lock`` from this
        capture through kernel DISPATCH (not materialization): donation
        invalidates arrays Python-side immediately, but an already-enqueued
        execution pins its buffers, so capture+dispatch under the lock is
        race-free while the blocking readback stays outside it."""
        with self._lock:
            self.sync()
            if self.packed2:
                # int2 tier: vectors/scales are (coarse, fine) pairs
                return (
                    (self._device_vectors, self._device_fine),
                    self._device_source_ids,
                    (self._device_scales, self._device_fine_scales),
                )
            return self._device_vectors, self._device_source_ids, self._device_scales

    @property
    def sweep_rows(self) -> int:
        """Static row count a query sweep must cover (prefix of the
        capacity-sized device arrays; see sweep_rows_for).  Capture under
        the same lock as device_view so it can't race a growing ingest."""
        return sweep_rows_for(self.rows, self.capacity)

    def host_vectors_for(self, rows) -> np.ndarray:
        """f32 host mirror rows (exact rerank of quantized candidates).
        Reads through HostMirror: RAM or mmap, f32 or bf16-upcast.

        Copied UNDER the lock: upsert overwrites a live key's row in place
        without bumping reuse_gen (nothing moved), so a lock-free read
        racing the write could score a torn half-old/half-new vector and
        the consistency retry would never fire (review r3).  The copy is
        candidate-sized (k·overfetch rows), so the lock hold is tiny."""
        with self._lock:
            return self._mirror.read_f32(rows, self.dim)

    @property
    def _host_vectors(self) -> np.ndarray:
        """Raw mirror array (tests / size accounting)."""
        return self._mirror.arr

    # -- mutation ------------------------------------------------------------

    def _grow(self, need: int) -> None:
        new_cap = self.capacity
        while new_cap < need:
            new_cap *= 2
        if new_cap == self.capacity:
            return
        self._dirty = True  # device arrays must be reallocated at the new shape
        self.item_ids = np.concatenate(
            [self.item_ids, np.full(new_cap - self.capacity, -1, dtype=np.int64)]
        )
        self.source_ids = np.concatenate(
            [self.source_ids, np.full(new_cap - self.capacity, -1, dtype=np.int32)]
        )
        self._mirror.grow(new_cap)
        self.capacity = new_cap

    def upsert(
        self,
        item_ids: Sequence[int],
        source_ids: Sequence[int],
        vectors: np.ndarray,
    ) -> None:
        """Insert or overwrite a batch of rows keyed by item id."""
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected (N, {self.dim}) vectors, got {vectors.shape}")
        item_ids = np.asarray(list(item_ids), dtype=np.int64)
        source_ids = np.asarray(list(source_ids), dtype=np.int32)
        uniq, first_idx = np.unique(item_ids, return_index=True)
        if len(uniq) < len(item_ids):  # dedupe within batch, keep last occurrence
            last = {int(i): idx for idx, i in enumerate(item_ids)}
            keep = np.fromiter(last.values(), dtype=np.int64)
            item_ids, source_ids, vectors = item_ids[keep], source_ids[keep], vectors[keep]
        with self._lock:
            self._grow(self.rows + max(0, len(item_ids) - len(self._free)))
            # existing rows keep their slot; new ids reuse tombstoned rows
            # first, then take contiguous fresh rows at the high-water mark
            get = self.row_of.get
            rows = np.fromiter(
                (get(int(i), -1) for i in item_ids), dtype=np.int64, count=len(item_ids)
            )
            new = rows < 0
            n_new = int(new.sum())
            if n_new:
                n_reuse = min(len(self._free), n_new)
                if n_reuse:
                    self.reuse_gen += 1
                reused = self._free[len(self._free) - n_reuse :]
                del self._free[len(self._free) - n_reuse :]
                fresh = np.concatenate(
                    [
                        np.asarray(reused, dtype=np.int64),
                        np.arange(self.rows, self.rows + n_new - n_reuse, dtype=np.int64),
                    ]
                )
                rows[new] = fresh
                self.rows += n_new - n_reuse
                self.row_of.update(zip(item_ids[new].tolist(), fresh.tolist()))
            for k in item_ids.tolist():
                iid = k // CHUNK_STRIDE
                g = self.groups.get(iid)
                if g is None:
                    k0 = iid * CHUNK_STRIDE
                    if k == k0:
                        # plain chunk-0 row: implicit single-key group — no
                        # dict entry (a set per single-chunk item costs ~8 GB
                        # of host RAM at 40M rows; keys_of_group synthesizes
                        # the implicit group from row_of)
                        continue
                    g = {k0} if k0 in self.row_of else set()
                    self.groups[iid] = g
                before = len(g)
                g.add(k)
                if before == 1 and len(g) == 2:
                    self.multi_chunk_groups += 1
            self.item_ids[rows] = item_ids
            self.source_ids[rows] = source_ids
            self._mirror.write(rows, vectors, self.dim)
            if not self._dirty:  # a pending full upload covers every row
                self._dirty_rows.update(rows.tolist())
            self._note_delta(rows)
            if len(item_ids):
                self.mutation_gen += 1
            if self.quantized and len(vectors):
                # scale_hw = the largest per-dim quantization STEP over all
                # rows (feeds the escalation noise margin, searcher._scan).
                # int2's grid {-3,-1,1,3}*(rms/2) has step 2s = rms.
                if self.packed2:
                    step = float(np.sqrt((vectors**2).mean(axis=1)).max())
                else:
                    qmax = 7.0 if self.packed4 else 127.0
                    step = float(np.abs(vectors).max()) / qmax
                self.scale_hw = max(self.scale_hw, step)
                self.norm_hw = max(
                    self.norm_hw, float(np.linalg.norm(vectors, axis=1).max())
                )

    def remove(self, item_ids: Sequence[int]) -> int:
        """Tombstone rows (hide/delete).  Returns how many existed."""
        n = 0
        with self._lock:
            for iid in item_ids:
                row = self.row_of.pop(iid, None)
                if row is not None:
                    g = self.groups.get(iid // CHUNK_STRIDE)
                    if g is not None:
                        before = len(g)
                        g.discard(iid)
                        if before == 2 and len(g) == 1:
                            self.multi_chunk_groups -= 1
                        if not g:
                            del self.groups[iid // CHUNK_STRIDE]
                    self.source_ids[row] = -1
                    self.item_ids[row] = -1
                    if not self._dirty:
                        self._dirty_rows.add(int(row))
                    self._note_delta((int(row),))
                    self._note_removed(iid)
                    self._free.append(int(row))
                    n += 1
            if n:
                self.mutation_gen += 1
            self._maybe_compact()
        return n

    # Compaction trigger: tombstones outnumber live rows by this floor.
    # Below it the dead prefix rows cost < one ladder bucket of sweep time
    # and moving rows would churn the delta snapshot for nothing.
    _COMPACT_MIN = 4096

    def _maybe_compact(self) -> None:
        live = len(self.row_of)
        if self.rows - live >= max(self._COMPACT_MIN, live):
            self.compact()

    def compact(self) -> int:
        """Pack live rows into the prefix [0, live) and lower the high-water
        mark, so the prefix sweep (sweep_rows) shrinks back after mass
        removals — without it, `source remove` of a large source leaves the
        hwm (and every query's sweep cost) stuck at its peak forever.

        Moves only the live rows stranded in the tail; the raw mirror rows
        copy losslessly in storage dtype, device state follows through the
        normal dirty-row sync, and ``reuse_gen`` bumps exactly as for
        tombstone reuse so an in-flight search that captured pre-move
        device arrays retries instead of decoding a moved row as its old
        key (searcher._search_consistent).  Returns rows moved.

        Auto-invoked from remove/remove_source past _COMPACT_MIN; callable
        explicitly for tests/maintenance."""
        with self._lock:
            live = len(self.row_of)
            moved = 0
            if self.rows > live:
                # vectorized: the lock is also what searches dispatch under,
                # so no per-row Python loop here (a multi-M-row compaction
                # would stall serving for its duration otherwise)
                srcs = live + np.nonzero(self.item_ids[live : self.rows] >= 0)[0]
                dsts = np.nonzero(self.item_ids[:live] < 0)[0][: len(srcs)]
                if len(srcs):
                    # bump BEFORE mutating (same ordering as upsert): a
                    # lock-free decode (searcher._search_consistent reads
                    # item_ids without the lock) that observes mid-move
                    # state must also observe the bumped gen, or its
                    # reuse_gen recheck would pass against torn mappings
                    # (review r3)
                    self.reuse_gen += 1
                    self.mutation_gen += 1
                    arr = self._mirror.arr
                    arr[dsts] = arr[srcs]
                    keys = self.item_ids[srcs]
                    self.item_ids[dsts] = keys
                    self.source_ids[dsts] = self.source_ids[srcs]
                    self.item_ids[srcs] = -1
                    self.source_ids[srcs] = -1
                    self.row_of.update(zip(keys.tolist(), dsts.tolist()))
                    if not self._dirty:
                        self._dirty_rows.update(dsts.tolist())
                        self._dirty_rows.update(srcs.tolist())
                    self._note_delta(dsts)
                    self._note_delta(srcs)
                    moved = len(srcs)
                self.rows = live
            # rebuild the free list from ground truth: moves consumed every
            # free slot below the new hwm, and slots past it are unreachable
            self._free = [
                int(r) for r in np.nonzero(self.item_ids[: self.rows] < 0)[0]
            ]
            return moved

    def _note_delta(self, rows) -> None:
        """Track rows changed since the last full snapshot (delta-snapshot
        support).  Past the churn threshold the sets drop and the next
        snapshot is a full rewrite."""
        if self._delta_rows is None:
            return
        self._delta_rows.update(int(r) for r in rows)
        self._delta_overflow_check()

    def _note_removed(self, key: int) -> None:
        """Track a removed KEY since the last full snapshot — deltas must
        convey deletions or a raw load_snapshot would resurrect removed
        items (the Searcher load path also reconciles against the DB, but
        the classmethod loader has no DB)."""
        if self._delta_rows is None:
            return
        self._delta_removed.add(int(key))
        self._delta_overflow_check()

    def _delta_overflow_check(self) -> None:
        if (
            self._delta_rows is not None
            and len(self._delta_rows) + len(self._delta_removed)
            > min(max(self.rows, 1024) // 4, 2_000_000)
        ):
            self._delta_rows = None
            self._delta_removed = set()

    @property
    def tier_name(self) -> str:
        """Display label of the storage tier, e.g. ``bfloat16``, ``int4``,
        ``int2+int8fine`` — the ONE home of the string `stats` and serve's
        ``/status`` both report (review r3: two hand-rolled copies)."""
        name = str(getattr(self.dtype, "__name__", self.dtype))
        if self.packed2:
            name += f"+int{self.fine_bits}fine"
        return name

    def retier(self, dtype) -> None:
        """Switch the storage dtype in place; the next sync restages the
        whole matrix from the host mirror in the new tier.  Lets the
        auto-tier rule follow a corpus that crosses a threshold MID-SESSION
        (a first big ingest in a fresh DB would otherwise stay in the
        startup tier — bf16 at 40M rows is ~30 GB of HBM and OOMs where the
        int4 tier fits; round-3 review)."""

        def tier_name(dt) -> str:
            return dt if isinstance(dt, str) else str(
                np.dtype(jax.dtypes.canonicalize_dtype(dt))
            )

        with self._lock:
            if tier_name(dtype) == tier_name(self.dtype):
                return
            # a tier switch invalidates every in-flight capture the same way
            # row reuse does: a sweep dispatched on the OLD tier's arrays
            # must not have its scores consumed under the NEW tier's scan
            # semantics (e.g. int8-approximate values served un-reranked
            # because the matrix now reads as non-quantized), and a full
            # snapshot save streaming mid-retier must fail its publish
            # check rather than pair old-tier payload members with the new
            # tier label (review r3)
            self.reuse_gen += 1
            self.dtype = dtype
            self._device_scales = None
            self._device_fine = None
            self._device_fine_scales = None
            # fresh tier, unaudited: trust until the searcher's corpus
            # self-audit (which its retier hook re-runs) says otherwise
            self.coarse_trusted = True
            self.coarse_select = "approx"
            self.coarse_fetch = 0
            self._dirty = True  # full restage in the new storage dtype
            self._dirty_rows.clear()
            self.mutation_gen += 1  # sweep scores change between tiers
            if self.quantized:
                # upsert only maintains the high-water quantization stats
                # while the matrix IS quantized — rows ingested in a wider
                # tier never touched them, so a mid-session retier must
                # recompute from the mirror or the rerank escalation margin
                # (searcher._scan, PERCEIVE_TPU_RERANK_MARGIN_SIGMA) would
                # silently underestimate the noise (round-3 review).  Also
                # rescales on int8 -> int4 (qmax 127 -> 7).
                qmax = 7.0 if self.packed4 else 127.0
                scale_hw = norm_hw = 0.0
                for lo in range(0, self.rows, self._SYNC_CHUNK_ROWS):
                    hi = min(lo + self._SYNC_CHUNK_ROWS, self.rows)
                    v = self._mirror.read_f32(slice(lo, hi), self.dim)
                    if len(v):
                        if self.packed2:  # step = rms (see upsert)
                            step = float(np.sqrt((v**2).mean(axis=1)).max())
                        else:
                            step = float(np.abs(v).max()) / qmax
                        scale_hw = max(scale_hw, step)
                        norm_hw = max(
                            norm_hw, float(np.linalg.norm(v, axis=1).max())
                        )
                self.scale_hw, self.norm_hw = scale_hw, norm_hw

    def clear(self) -> None:
        """Drop every row and all delta tracking (a failed snapshot load
        falls back to a full rebuild — the partially-loaded state must not
        leak stale keys into it)."""
        with self._lock:
            self.rows = 0
            self._free.clear()
            self.row_of.clear()
            self.groups.clear()
            self.multi_chunk_groups = 0
            self.item_ids[:] = -1
            self.source_ids[:] = -1
            self._dirty = True  # next sync re-uploads the (empty) state
            self._dirty_rows.clear()
            # None, NOT fresh sets: the post-clear rebuild's mutations are
            # not cumulative against any existing base — a delta written
            # against the old base would omit removals that were recorded
            # only in the discarded state and resurrect them on load
            # (review r3).  The next save is forced to a full base.
            self._delta_rows = None
            self._delta_removed = set()
            # every row index is re-exposed for reallocation: an in-flight
            # search must retry, exactly as for tombstone reuse (review r3)
            self.reuse_gen += 1
            self.mutation_gen += 1

    def keys_of_group(self, item_id: int) -> list[int]:
        """All chunk keys currently stored for an item.  Single chunk-0
        items have no explicit group entry (see upsert) — the implicit group
        is synthesized from row_of."""
        g = self.groups.get(item_id)
        if g is not None:
            return list(g)
        k0 = item_id * CHUNK_STRIDE
        return [k0] if k0 in self.row_of else []

    def remove_source(self, source_id: int) -> int:
        """Drop every row of a source (prelude to rebuild_source).

        Bulk array ops + one pass of dict bookkeeping: this holds the same
        lock queries dispatch under, so a multi-M-row source removal must
        not loop per-row over numpy scalar indexing and per-row set calls
        (review r3; compact() was vectorized for the same reason)."""
        with self._lock:
            rows = np.nonzero(self.source_ids[: self.rows] == source_id)[0]
            if len(rows) == 0:
                return 0
            keys = self.item_ids[rows].tolist()
            self.source_ids[rows] = -1
            self.item_ids[rows] = -1
            if not self._dirty:
                self._dirty_rows.update(rows.tolist())
            self._note_delta(rows)
            for key in keys:
                self.row_of.pop(key, None)
                g = self.groups.get(key // CHUNK_STRIDE)
                if g is not None:
                    before = len(g)
                    g.discard(key)
                    if before == 2 and len(g) == 1:
                        self.multi_chunk_groups -= 1
                    if not g:
                        del self.groups[key // CHUNK_STRIDE]
                self._note_removed(key)
            self._free.extend(int(r) for r in rows)
            self.mutation_gen += 1
            self._maybe_compact()
            return len(rows)

    def __len__(self) -> int:
        return len(self.row_of)

    # -- snapshots (vector_shards manifest) -----------------------------------

    def save_snapshot(self, path: str, *, incremental: bool = True, payload: bool = True) -> str:
        """Persist to .npz for fast startup.  Returns "full" or "delta".

        ``payload=True`` (format v2, round 3) additionally streams the
        QUANTIZED device payload (tier bytes + scales) into the base so a
        tier-matching reload adopts the stored layout directly
        (adopt_snapshot): no per-row upsert bookkeeping and no
        re-quantization pass at startup.  ``payload=False`` writes the v1
        f32-only base (and is what the bounded-churn delta form always is).

        Round 2 held the matrix lock across the whole multi-GB np.savez, so
        every autosave stalled all searches for the full write (VERDICT r2
        #4).  Now:

        * **delta**: when a base snapshot exists and few rows changed since
          it, only those rows are written to ``path + ".delta"`` (cumulative
          since the base, replaced each save) — autosave after a small
          rescan costs MBs, not a full corpus rewrite;
        * **full**: written in row chunks with the lock held only per-chunk
          copy, never across file writes.  Rows mutated after their chunk
          was copied are newer than the manifest's max_seq and get replayed
          on load; rows REUSED mid-save (tombstone handed to a new item)
          could misattribute a vector, so the save retries on reuse_gen
          movement and finally falls back to holding the lock.
        * both forms assemble at a temp path and os.replace — a crash
          mid-save never corrupts the previous snapshot;
        * every base carries a random ``base_token`` and each delta records
          the token of the base it extends — a delta is only ever applied
          to ITS base, so no crash ordering can pair a stale delta with a
          newer base (which would silently regress rows) or lose rows when
          a full rewrite fails after deltas advanced the manifest's
          max_seq (the old base + old delta stay valid until the new base
          has atomically landed).
        """
        # serialize whole saves: two concurrent saves (serve-refresh autosave
        # racing an explicit `snapshot`) would share the same .tmp.{pid}
        # temp file and interleave writes into it (review r3)
        with self._snapshot_io_lock:
            return self._save_snapshot_locked(path, incremental=incremental, payload=payload)

    def _save_snapshot_locked(self, path: str, *, incremental: bool, payload: bool = True) -> str:
        delta_path = path + ".delta"
        with self._lock:
            has_delta_tracking = self._delta_rows is not None
        token, fmt, tier = self._snapshot_base_info(path)
        if incremental and has_delta_tracking and token is not None:
            if payload and (fmt < 2 or tier != self.dtype_name):
                # pre-v2 base, or a base whose stored tier no longer matches
                # the matrix (mid-session auto-retier): a delta would extend
                # a base the adopt fast path rejects, leaving the slow
                # streaming load in place forever — and making the doctor's
                # "run `snapshot` once to upgrade" advice a no-op (review
                # r3).  Fall through to a full save so one re-save really
                # produces a fast-adopt base in the current tier.
                pass
            # _write_delta re-checks tracking under its own lock: an
            # overflow racing the check above demotes to a full save
            # instead of crashing on sorted(None) (review r3).
            elif self._write_delta(delta_path, token):
                return "delta"
        new_token = os.urandom(16).hex()
        for attempt in range(3):
            if self._write_full_snapshot(
                path, locked=attempt == 2, token=new_token, payload=payload
            ):
                break
        # any leftover delta belongs to the previous base (token mismatch —
        # ignored on load even if this unlink never happens)
        if os.path.exists(delta_path):
            os.unlink(delta_path)
        return "full"

    @staticmethod
    def _snapshot_base_info(path: str):
        """(base_token, fmt, tier) of a base snapshot from ONE zip-directory
        parse, handle closed; (None, 0, None) for missing/legacy/corrupt
        bases (anything the adopt fast path cannot use verbatim)."""
        token, fmt, tier = None, 0, None
        try:
            with np.load(path) as z:
                files = set(getattr(z, "files", []))
                if "base_token" in files:
                    token = str(z["base_token"])
                if "fmt" in files:
                    fmt = int(z["fmt"])
                if "tier" in files:
                    tier = str(z["tier"])
        except Exception:  # noqa: BLE001
            pass
        return token, fmt, tier

    @classmethod
    def _snapshot_token(cls, path: str):
        """base_token of a snapshot file, or None (missing/legacy/corrupt)."""
        return cls._snapshot_base_info(path)[0]

    @classmethod
    def _snapshot_fmt(cls, path: str) -> int:
        """Format version of a base snapshot (0 for pre-v2)."""
        return cls._snapshot_base_info(path)[1]

    @staticmethod
    def _replace_into(path: str, write_fn) -> None:
        """Assemble a file at a temp sibling, then atomically replace."""
        tmp = f"{path}.tmp.{os.getpid()}"
        try:
            write_fn(tmp)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    @property
    def dtype_name(self) -> str:
        """Stable tier identifier: the "int4"/"int2" sentinels as-is, JAX
        dtypes canonicalized ("bfloat16", "int8", "float32")."""
        return self.dtype if isinstance(self.dtype, str) else str(
            np.dtype(jax.dtypes.canonicalize_dtype(self.dtype))
        )

    def _write_full_snapshot(self, path: str, *, locked: bool, token: str,
                             payload: bool = True) -> bool:
        """Stream a full base snapshot.  Returns True when the file was
        atomically published, False when tombstone reuse raced the stream
        (the caller retries; nothing was replaced on disk — publishing an
        attempt BEFORE the reuse_gen check would leave a known-inconsistent
        base live until the retry lands, review r3).

        Delta tracking is reset at the instant the row state is captured
        (same lock acquisition), not after the write: a remove() landing
        during the multi-GB stream must survive into the NEXT delta — the
        just-captured base still holds its key live.  If the attempt does
        not publish, the pre-capture sets are merged back so the old base's
        delta stays cumulative."""
        import contextlib
        import zipfile

        from numpy.lib import format as npf

        outer = self._lock if locked else contextlib.nullcontext()
        with outer:
            with self._lock:
                gen = self.reuse_gen
                rows = self.rows
                item_ids = self.item_ids[:rows].copy()
                source_ids = self.source_ids[:rows].copy()
                scale_hw, norm_hw = self.scale_hw, self.norm_hw
                old_delta_rows = self._delta_rows
                old_delta_removed = self._delta_removed
                self._delta_rows = set()  # fresh base: tracking restarts
                self._delta_removed = set()

            published = False
            try:

                def stream_quantized(zf, name: str, descr: str, width: int, quant_fn) -> np.ndarray:
                    """Stream one quantized-payload member: quantize mirror
                    row chunks (full padded width — the quantizers slice
                    plane layouts out of padded_dim) under short locks,
                    write the bytes, return the per-row scales.  A row
                    mutated mid-stream diverges from the f32 member the
                    same way the f32 chunks diverge from each other — its
                    seq > the manifest's max_seq, so the load-time replay
                    re-upserts it over both."""
                    scales = np.empty((rows,), np.float32)
                    with zf.open(name + ".npy", "w", force_zip64=True) as f:
                        npf.write_array_header_1_0(
                            f,
                            {"descr": descr, "fortran_order": False,
                             "shape": (rows, width)},
                        )
                        for lo in range(0, rows, self._SYNC_CHUNK_ROWS):
                            hi = min(lo + self._SYNC_CHUNK_ROWS, rows)
                            with self._lock:
                                chunk = self._mirror.read_f32(slice(lo, hi))
                            q, s = quant_fn(chunk)
                            f.write(np.ascontiguousarray(q).tobytes())
                            scales[lo:hi] = s
                    return scales

                def write(tmp: str) -> None:
                    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED, allowZip64=True) as zf:
                        for name, arr in (
                            ("dim", np.int64(self.dim)),
                            ("fmt", np.int64(2)),
                            ("tier", np.str_(self.dtype_name)),
                            ("scale_hw", np.float32(scale_hw)),
                            ("norm_hw", np.float32(norm_hw)),
                            ("base_token", np.str_(token)),
                            ("item_ids", item_ids),
                            ("source_ids", source_ids),
                        ):
                            with zf.open(name + ".npy", "w", force_zip64=True) as f:
                                npf.write_array(f, np.asarray(arr), allow_pickle=False)
                        # vectors stream chunk by chunk: header for the full
                        # shape, then per-chunk bytes copied under a short lock
                        with zf.open("vectors.npy", "w", force_zip64=True) as f:
                            npf.write_array_header_1_0(
                                f,
                                {"descr": "<f4", "fortran_order": False,
                                 "shape": (rows, self.dim)},
                            )
                            for lo in range(0, rows, self._SYNC_CHUNK_ROWS):
                                hi = min(lo + self._SYNC_CHUNK_ROWS, rows)
                                with self._lock:
                                    chunk = self._mirror.read_f32(slice(lo, hi), self.dim)
                                f.write(np.ascontiguousarray(chunk).tobytes())
                        if payload and self.quantized and rows:
                            # quantized device payload (format v2): lets a
                            # tier-matching reload adopt the rows without
                            # re-quantizing the whole corpus (adopt_snapshot)
                            pd = self.padded_dim
                            if self.packed2:
                                fb = int2_fine_bits(
                                    self.capacity, pd, self.row_shards
                                )
                                fine_fn = self._quantize if fb == 8 else self._quantize4
                                names = [
                                    ("q_coarse", "|u1", pd // 4, self._quantize2),
                                    ("q_fine", "|i1" if fb == 8 else "|u1",
                                     pd if fb == 8 else pd // 2, fine_fn),
                                ]
                            elif self.packed4:
                                names = [("q_vectors", "|u1", pd // 2, self._quantize4)]
                            else:  # int8
                                names = [("q_vectors", "|i1", pd, self._quantize)]
                            for name, descr, width, fn in names:
                                s = stream_quantized(zf, name, descr, width, fn)
                                with zf.open(name + "_scales.npy", "w", force_zip64=True) as f:
                                    npf.write_array(f, s, allow_pickle=False)

                tmp = f"{path}.tmp.{os.getpid()}"
                try:
                    write(tmp)
                    # publish under the lock: reuse_gen bumps hold the lock,
                    # so an unchanged gen here proves no tombstone reuse
                    # happened before the replace
                    with self._lock:
                        if self.reuse_gen == gen:
                            os.replace(tmp, path)
                            published = True
                finally:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
            finally:
                if not published:
                    with self._lock:
                        if old_delta_rows is None:
                            # tracking was already overflowed pre-capture:
                            # the lost records can't be resurrected; stay
                            # in forced-full-save mode
                            self._delta_rows = None
                            self._delta_removed = set()
                        elif self._delta_rows is not None:
                            self._delta_rows |= old_delta_rows
                            self._delta_removed |= old_delta_removed
                            self._delta_overflow_check()
            return published

    def _write_delta(self, delta_path: str, token: str) -> bool:
        """Cumulative delta since the last full base: (chunk keys, source
        ids, f32 vectors) of every row changed since the base plus the keys
        removed since it — applied by remove-then-upsert on load, so row
        numbers need not match the base's and re-added keys win.  Carries
        the base's token (only applied to that exact base).

        Returns False (nothing written; caller does a full save) when delta
        tracking overflowed to None between the caller's check and this
        lock — sorted(None) would otherwise crash the save (review r3).

        The changed-row set, the removed-key set, and the row CONTENTS are
        captured under ONE lock acquisition: capturing the sets in an
        earlier acquisition would let a remove() racing between the two
        slip out of removed_keys while the base still holds the key live —
        resurrecting the item on a crash-reload (review r3)."""
        with self._lock:  # one bounded copy (delta capped at _note_delta)
            if self._delta_rows is None:
                return False
            idx = np.asarray(sorted(self._delta_rows), dtype=np.int64)
            removed = sorted(self._delta_removed)
            item_ids = self.item_ids[idx].copy()
            source_ids = self.source_ids[idx].copy()
            vectors = self._mirror.read_f32(idx, self.dim)

        import zipfile

        from numpy.lib import format as npf

        def write_zip(tmp: str) -> None:
            with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED, allowZip64=True) as zf:
                for name, arr in (
                    ("dim", np.int64(self.dim)),
                    ("base_token", np.str_(token)),
                    ("item_ids", item_ids),
                    ("source_ids", source_ids),
                    ("vectors", vectors),
                    ("removed_keys", np.asarray(removed, dtype=np.int64)),
                ):
                    with zf.open(name + ".npy", "w", force_zip64=True) as f:
                        npf.write_array(f, np.asarray(arr), allow_pickle=False)

        self._replace_into(delta_path, write_zip)
        return True

    # Rows per chunk when streaming snapshot vectors back in at load time.
    # 1M × 384-d f32 ≈ 1.5 GB peak transient — bounded regardless of corpus
    # size (a 40M-row int4-tier corpus has a ~61 GB f32 vectors member; the
    # old `z["vectors"][live]` materialized ALL of it, defeating the
    # HostMirror RAM budget the write path honors — review r3).
    _LOAD_CHUNK_ROWS = 1_048_576

    @staticmethod
    def _member_mmap(path: str, name: str, fh=None):
        """Read-only memmap over a ZIP_STORED 2-D .npy member's data bytes,
        or None when the member is absent/compressed/foreign-layout.

        The zip layer costs real time at corpus scale: ZipExtFile reads in
        small Python-level chunks and CRCs every byte (~2x the raw disk cost
        measured at 1M x 384).  Members we wrote are ZIP_STORED, so the
        array bytes sit contiguous in the file — map them and let numpy
        copy file->destination directly.  CRC validation is skipped on this
        path: the snapshot is a cache over SQLite (corruption at worst
        degrades scores until the next rebuild), and structural checks
        (token, dim, shapes) still apply.

        ``fh``: an already-open binary handle on the snapshot.  When given,
        BOTH the zip directory and the mapping use it, so every byte comes
        from the same inode even if ``path`` is concurrently os.replace'd
        (the caller threads ONE handle through all member reads — the base
        cannot be a mix of two saves)."""
        import struct
        import zipfile

        from numpy.lib import format as npf

        f = None
        try:
            with zipfile.ZipFile(fh if fh is not None else path) as zf:
                # ZipFile(file_object).close() leaves the object open
                info = zf.getinfo(name + ".npy")
                if info.compress_type != zipfile.ZIP_STORED:
                    return None
            f = fh if fh is not None else open(path, "rb")
            f.seek(info.header_offset)
            hdr = f.read(30)  # local file header (its name/extra lengths
            # can differ from the central directory's copy)
            if len(hdr) != 30 or hdr[:4] != b"PK\x03\x04":
                return None
            nlen, elen = struct.unpack("<HH", hdr[26:30])
            f.seek(info.header_offset + 30 + nlen + elen)
            version = npf.read_magic(f)
            if version == (1, 0):
                shape, fortran, descr = npf.read_array_header_1_0(f)
            elif version == (2, 0):
                shape, fortran, descr = npf.read_array_header_2_0(f)
            else:
                return None
            if fortran or len(shape) != 2:
                return None
            return np.memmap(
                f, dtype=np.dtype(descr), mode="r", offset=f.tell(),
                shape=shape,
            )
        except Exception:  # noqa: BLE001 — caller falls back to zipfile reads
            return None
        finally:
            if f is not None and fh is None:
                f.close()

    @classmethod
    def _iter_snapshot_member(cls, path: str, name: str, want_dtype, chunk_rows: int,
                              fh=None):
        """Yield (lo, hi, ndarray) row chunks of an uncompressed 2-D .npy
        member without materializing the whole array (the writer streams
        members ZIP_STORED, so sequential reads are raw copies).  Chunks
        from the mapped fast path are read-only VIEWS — consumers copy into
        their destination (mirror write / staging slice assignment), which
        is exactly one file->dest copy.  ``fh`` pins all reads to one open
        handle (see _member_mmap)."""
        import zipfile

        from numpy.lib import format as npf

        want = np.dtype(want_dtype)
        mapped = cls._member_mmap(path, name, fh)
        if mapped is not None and mapped.dtype == want:
            rows = mapped.shape[0]
            for lo in range(0, rows, chunk_rows):
                hi = min(lo + chunk_rows, rows)
                yield lo, hi, mapped[lo:hi]
            return
        with zipfile.ZipFile(fh if fh is not None else path) as zf, \
                zf.open(name + ".npy") as f:
            version = npf.read_magic(f)
            if version == (1, 0):
                shape, fortran, descr = npf.read_array_header_1_0(f)
            elif version == (2, 0):
                shape, fortran, descr = npf.read_array_header_2_0(f)
            else:  # unknown future format: let np.load handle it whole
                if fh is not None:
                    fh.seek(0)
                data = np.load(fh if fh is not None else path)[name]
                yield 0, data.shape[0], np.asarray(data, dtype=want)
                return
            rows, dim = shape
            if fortran or np.dtype(descr) != want:
                # legacy/foreign layout: fall back to one full read
                data = np.frombuffer(f.read(), dtype=descr).reshape(shape)
                yield 0, rows, data.astype(want, copy=False)
                return
            row_bytes = dim * want.itemsize
            for lo in range(0, rows, chunk_rows):
                hi = min(lo + chunk_rows, rows)
                buf = f.read((hi - lo) * row_bytes)
                yield lo, hi, np.frombuffer(buf, dtype=want).reshape(hi - lo, dim)

    @classmethod
    def _iter_snapshot_vectors(cls, path: str, chunk_rows: int, fh=None):
        """(lo, hi, f32 rows) chunks of the ``vectors`` member."""
        return cls._iter_snapshot_member(path, "vectors", "<f4", chunk_rows, fh)

    @staticmethod
    def _snapshot_member_shape(path: str, name: str, fh=None):
        """Shape of one .npy member from its header alone (no data read);
        None when the member is absent or unreadable."""
        import zipfile

        from numpy.lib import format as npf

        try:
            with zipfile.ZipFile(fh if fh is not None else path) as zf, \
                    zf.open(name + ".npy") as f:
                version = npf.read_magic(f)
                if version == (1, 0):
                    return npf.read_array_header_1_0(f)[0]
                if version == (2, 0):
                    return npf.read_array_header_2_0(f)[0]
        except Exception:  # noqa: BLE001
            pass
        return None

    def adopt_snapshot(self, path: str) -> bool:
        """Direct-layout restore of a format-v2 base into THIS (fresh,
        empty) matrix — the fast startup path.

        Instead of re-upserting every row (per-row dict/group bookkeeping)
        and re-quantizing the whole corpus into the storage tier
        (_stage_full), the stored row layout is copied verbatim —
        tombstones, row numbers and the free list included — and the device
        arrays come from the snapshot's quantized payload members.  Returns
        False without mutating anything when the base is v1/foreign, the
        tier or dim doesn't match this matrix, the int2 fine-companion
        width disagrees with the current HBM policy, or the matrix already
        holds rows — the caller then falls back to the v1 streaming-upsert
        load, which handles all of those by construction.

        Rows that mutated while the base was being written diverge from
        the payload exactly as they diverge from the f32 member; both are
        healed by the same seq replay / delta application that the v1 path
        relies on (Searcher._load_snapshot).

        Every byte — metadata, f32 mirror, quantized payload — is read
        through ONE open handle, so a concurrent os.replace of ``path``
        (another process saving) can never mix members of two different
        bases into the adopted state (review r3)."""
        try:
            fh = open(path, "rb")
        except OSError:
            return False
        with fh:
            return self._adopt_snapshot_fh(path, fh)

    def _adopt_snapshot_fh(self, path: str, fh) -> bool:
        fh.seek(0)  # np.load sniffs the zip magic from the current position
        z = np.load(fh)
        files = set(getattr(z, "files", []))
        # exact-version gate: a future fmt=3 may re-encode the payload
        # members under the same names — only the format this code wrote
        # is safe to adopt (anything else streams through the v1 path)
        if "fmt" not in files or int(z["fmt"]) != 2:
            return False
        if int(z["dim"]) != self.dim or str(z["tier"]) != self.dtype_name:
            return False
        item_ids = np.asarray(z["item_ids"], np.int64)
        source_ids = np.asarray(z["source_ids"], np.int32)
        n = int(len(item_ids))
        pd = self.padded_dim
        with self._lock:
            if self.rows or self.row_of:
                return False
            # grow FIRST, then validate payload shapes against the ACTUAL
            # capacity policy (no hand-duplicated doubling prediction that
            # could drift from _grow); growing leaves an empty, still-valid
            # matrix even when a check below rejects the base
            self._grow(max(n, 1))
            if self.quantized and n:
                if self.packed2:
                    if not {"q_coarse", "q_coarse_scales", "q_fine",
                            "q_fine_scales"} <= files:
                        return False
                    fb = int2_fine_bits(self.capacity, pd, self.row_shards)
                    if self._snapshot_member_shape(path, "q_fine", fh) != (
                        n, pd if fb == 8 else pd // 2
                    ):
                        return False  # stored companion ≠ current HBM policy
                    if self._snapshot_member_shape(path, "q_coarse", fh) != (n, pd // 4):
                        return False
                else:
                    if not {"q_vectors", "q_vectors_scales"} <= files:
                        return False
                    want_w = pd // 2 if self.packed4 else pd
                    if self._snapshot_member_shape(path, "q_vectors", fh) != (n, want_w):
                        return False
            self.item_ids[:n] = item_ids
            self.source_ids[:n] = source_ids
            self.rows = n
            live_mask = source_ids >= 0
            live_rows = np.flatnonzero(live_mask)
            keys = item_ids[live_mask]
            self.row_of = dict(zip(keys.tolist(), live_rows.tolist()))
            # chunk-group index, same implicit-single-group rule as upsert
            # (only items with an off-zero chunk key get a dict entry)
            gm: dict[int, set] = {}
            for k in keys[keys % CHUNK_STRIDE != 0].tolist():
                gm.setdefault(k // CHUNK_STRIDE, set()).add(int(k))
            for iid, g in gm.items():
                k0 = iid * CHUNK_STRIDE
                if k0 in self.row_of:
                    g.add(k0)
            self.groups = gm
            self.multi_chunk_groups = sum(1 for g in gm.values() if len(g) > 1)
            self._free = np.flatnonzero(~live_mask).tolist()
            if "scale_hw" in files:
                self.scale_hw = float(z["scale_hw"])
                self.norm_hw = float(z["norm_hw"])
            # Overlapped restore (VERDICT r3 #4).  Two independent passes
            # used to run strictly in sequence (measured 15.1 s mirror +
            # 25.3 s payload staging + device_put at 2M x 384 int8):
            #
            #   * the f32 mirror pass (mmap page-in + memcpy into the
            #     host mirror) runs on a WORKER thread;
            #   * payload staging (+ the async device_put dispatches,
            #     which drain over whatever host work follows) runs on
            #     this thread.
            #
            # Both sides read the zip through positionless mmap views of
            # the ONE open handle (_member_mmap), so the single-handle
            # anti-mix guarantee holds and the threads never share a file
            # position.  The mirror is exclusively owned during adopt
            # (we hold self._lock and the matrix is empty), so the worker
            # needs no further locking; its exception, if any, re-raises
            # here after join.
            t_dev = time.perf_counter()
            # Pre-resolve the mirror source ON THIS thread: _member_mmap
            # seeks the shared handle while locating the member, so the
            # worker must only ever touch the returned positionless
            # memmap.  A base whose vectors member can't map (compressed /
            # foreign layout) falls back to the sequential order — the
            # zipfile streaming reader owns the handle's position.
            mapped = self._member_mmap(path, "vectors", fh)
            if mapped is not None and mapped.dtype != np.dtype("<f4"):
                mapped = None
            mirror_err: list[BaseException] = []

            def _mirror_pass() -> None:
                try:
                    self._mirror_copy_from(mapped)
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    mirror_err.append(e)

            mt = None
            if mapped is not None:
                mt = threading.Thread(target=_mirror_pass, name="adopt-mirror")
                mt.start()
            try:
                if self.quantized and n:
                    self._adopt_device(z, path, n, fh)
                    self._device_source_ids = jax.device_put(
                        self.source_ids, self.ids_device
                    )
                    self._dirty = False
                    self._dirty_rows.clear()
                else:
                    # bf16/f32 tiers store no payload: first sync casts the
                    # mirror (no quantization pass to skip)
                    self._dirty = True
            finally:
                t_stage = time.perf_counter()
                if mt is not None:
                    mt.join()
            if mirror_err:
                raise mirror_err[0]
            if mapped is None:
                # sequential fallback: the streaming reader seeks fh
                for lo, hi, vecs in self._iter_snapshot_vectors(
                    path, self._LOAD_CHUNK_ROWS, fh
                ):
                    self._mirror.write(slice(lo, hi), vecs, self.dim)
            if os.environ.get("PERCEIVE_TPU_DEBUG_STARTUP"):
                t_end = time.perf_counter()
                print(
                    f"adopt phases: stage+dispatch {t_stage - t_dev:.2f}s  "
                    f"mirror-wait {t_end - t_stage:.2f}s  "
                    f"overlapped={mapped is not None}  (n={n})",
                    file=sys.stderr,
                )
            if self._mirror.path is not None:
                self._mirror.remap()  # drop bulk-load page residency
            self.mutation_gen += 1
        return True

    def _mirror_copy_from(self, mapped) -> None:
        """Bulk-copy the snapshot's f32 ``vectors`` member (a positionless
        memmap) into the host mirror.

        The naive single-threaded chunk loop was page-fault bound: every
        chunk paid a synchronous major fault per source page (disk read)
        plus, for a spilled mirror, a fault per destination page — the
        measured "mirror-bound" adopt floor (~25.7 s of a 34 s load at
        2M x 384; BENCH_NOTES round-4).  Two fixes, both kernel-level, so
        they help even on a 1-core host where threads cannot add CPU:

        * ``madvise``: MADV_SEQUENTIAL over the whole member (double
          readahead, drop-behind), plus MADV_WILLNEED per chunk before its
          copy — the kernel issues the chunk's disk reads asynchronously
          while the previous chunk's memcpy runs.
        * a small worker pool (PERCEIVE_TPU_MIRROR_THREADS, default 4)
          pulling chunks off a shared counter: numpy's assignment loop
          releases the GIL, so concurrent workers overlap their major-
          fault IO waits even with one CPU.

        Exclusively owned during adopt (matrix lock held, matrix empty) —
        workers write disjoint row slices, no further locking."""
        import mmap as _mmapmod

        rows_m = int(mapped.shape[0])
        if rows_m == 0:
            return
        rowbytes = int(mapped.shape[1]) * mapped.dtype.itemsize
        chunk = max(1, _MIRROR_COPY_CHUNK_BYTES // max(rowbytes, 1))
        mm = getattr(mapped, "_mmap", None)
        base_off = 0
        if mm is not None:
            try:
                base_off = int(mapped.offset) % _mmapmod.ALLOCATIONGRANULARITY
                mm.madvise(_mmapmod.MADV_SEQUENTIAL)
            except (AttributeError, ValueError, OSError):
                mm = None  # advisory only: copy still works without it

        def _advise(lo: int, hi: int) -> None:
            if mm is None:
                return
            try:
                ps = _mmapmod.PAGESIZE
                start = base_off + lo * rowbytes
                end = min(base_off + hi * rowbytes, len(mm))
                start -= start % ps
                if end > start:
                    mm.madvise(_mmapmod.MADV_WILLNEED, start, end - start)
            except (ValueError, OSError):
                pass

        nchunks = -(-rows_m // chunk)
        try:
            nthreads = int(os.environ.get("PERCEIVE_TPU_MIRROR_THREADS", "4"))
        except ValueError:
            nthreads = 4
        nthreads = max(1, min(nthreads, nchunks))

        def _copy_chunk(ci: int) -> None:
            lo = ci * chunk
            hi = min(lo + chunk, rows_m)
            _advise(lo, hi)
            self._mirror.write(slice(lo, hi), mapped[lo:hi], self.dim)

        if nthreads == 1:
            for ci in range(nchunks):
                _copy_chunk(ci)
            return
        counter = iter(range(nchunks))
        clock = threading.Lock()
        errs: list[BaseException] = []

        def _worker() -> None:
            while True:
                with clock:
                    ci = next(counter, None)
                if ci is None or errs:
                    return
                try:
                    _copy_chunk(ci)
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    errs.append(e)
                    return

        workers = [
            threading.Thread(target=_worker, name=f"adopt-mirror-{i}")
            for i in range(nthreads)
        ]
        for w in workers:
            w.start()
        for w in workers:
            w.join()
        if errs:
            raise errs[0]

    def _adopt_device(self, z, path: str, n: int, fh=None) -> None:
        """Device arrays from the snapshot's payload members, laid out
        exactly as _stage_full/_stage_full_int2 would stage them (row-major
        int8; transposed packed int4/int2 + fine companion).  Tail rows
        beyond ``n`` stay zero — every kernel masks source_id < 0 rows, so
        their content never scores."""
        cap, pd = self.capacity, self.padded_dim
        dev = self._vectors_device()
        chunk = self._LOAD_CHUNK_ROWS

        def fill_transposed(name, width, dtype):
            staged = np.zeros((width, cap), dtype)
            for lo, hi, q in self._iter_snapshot_member(path, name, dtype, chunk, fh):
                staged[:, lo:hi] = q.T
            return staged

        def scales_of(name):
            s = np.zeros((cap,), np.float32)
            s[:n] = z[name]
            return jax.device_put(s, self.ids_device)

        if self.packed2:
            fine_w = self._snapshot_member_shape(path, "q_fine", fh)[1]
            fdt = np.int8 if fine_w == pd else np.uint8
            self._device_vectors = jax.device_put(
                fill_transposed("q_coarse", pd // 4, np.uint8), dev
            )
            self._device_scales = scales_of("q_coarse_scales")
            self._device_fine = jax.device_put(
                fill_transposed("q_fine", fine_w, fdt), dev
            )
            self._device_fine_scales = scales_of("q_fine_scales")
        elif self.packed4:
            self._device_vectors = jax.device_put(
                fill_transposed("q_vectors", pd // 2, np.uint8), dev
            )
            self._device_scales = scales_of("q_vectors_scales")
        else:  # int8, row-major (capacity, padded_dim)
            staged = np.zeros((cap, pd), np.int8)
            for lo, hi, q in self._iter_snapshot_member(
                path, "q_vectors", np.int8, chunk, fh
            ):
                staged[lo:hi] = q
            self._device_vectors = jax.device_put(staged, dev)
            self._device_scales = scales_of("q_vectors_scales")

    @classmethod
    def load_snapshot(cls, path: str, *, dtype: jnp.dtype = jnp.bfloat16) -> "EmbeddingMatrix":
        with open(path, "rb") as fh:
            z = np.load(fh)
            dim = int(z["dim"])
            token = (
                str(z["base_token"])
                if "base_token" in getattr(z, "files", [])
                else None
            )
            # row count from the member HEADER — the ids themselves are only
            # read on the streaming fallback (adopt re-reads nothing big)
            shape = cls._snapshot_member_shape(path, "item_ids", fh)
            rows = int(shape[0]) if shape else len(z["item_ids"])
            m = cls(dim, dtype=dtype, capacity=max(rows, 1))
            if not m._adopt_snapshot_fh(path, fh):  # v2 fast path (tier must match)
                item_ids, source_ids = z["item_ids"], z["source_ids"]
                for lo, hi, vecs in cls._iter_snapshot_vectors(
                    path, cls._LOAD_CHUNK_ROWS, fh
                ):
                    live = source_ids[lo:hi] >= 0
                    if not live.any():
                        continue
                    m.upsert(
                        item_ids[lo:hi][live].tolist(),
                        source_ids[lo:hi][live].tolist(),
                        vecs[live] if not live.all() else vecs,
                    )
        if m.apply_snapshot_delta(path, token) < 0:
            # a delta EXISTS but can't be trusted (corrupt / legacy tokenless
            # base): silently returning the bare base could drop the rows the
            # delta carried and resurrect keys removed since the base.  The
            # classmethod has no DB to rebuild from — fail loud (Searcher's
            # load path catches -1 itself and falls back to a full rebuild;
            # provably-STALE deltas of an older base are ignored, not raised).
            raise ValueError(
                f"snapshot delta {path}.delta is unusable (corrupt or "
                "unverifiable); delete it or rebuild from the database"
            )
        return m

    def apply_snapshot_delta(self, base_path: str, base_token: str = None) -> int:
        """Apply ``base_path + ".delta"`` (rows changed + keys removed since
        the base) if it exists AND its token matches the base's; returns how
        many live rows were applied, 0 when no delta exists **or the delta
        is provably STALE** (its token names a different base: a delta's
        token always equals the base that existed when it was saved, and a
        full snapshot captures the entire matrix state — so a newer base
        already contains everything a leftover older delta carried; the
        crash-between-base-replace-and-delta-unlink ordering is safe to
        ignore), or **-1 when a delta EXISTS but cannot be trusted**
        (corrupt, dim mismatch, or a tokenless legacy base that can't prove
        staleness).  -1 means the caller must fall back to a full rebuild:
        the vector_shards manifest's max_seq was advanced by delta saves, so
        seq replay alone does NOT cover the rows the unusable delta carried
        — ignoring it would silently drop them.  Removals apply first so a
        removed-then-re-added key ends live.

        ``base_token``: pass the token read from the SAME handle the base
        was loaded through; re-reading it from ``base_path`` here could see
        a concurrently-replaced newer base, and the newer base's delta must
        not be applied over the older base's rows (review r3)."""
        delta_path = str(base_path) + ".delta"
        if not os.path.exists(delta_path):
            return 0
        if base_token is None:
            base_token = self._snapshot_token(base_path)
        try:
            z = np.load(delta_path)
            if int(z["dim"]) != self.dim:
                return -1
            files = getattr(z, "files", [])
            if base_token is None or "base_token" not in files:
                return -1  # legacy/corrupt: can't prove the delta is stale
            if str(z["base_token"]) != base_token:
                return 0  # stale delta of an older base: superseded, ignore
            if "removed_keys" in files:
                gone = [int(k) for k in z["removed_keys"]]
                if gone:
                    self.remove(gone)
            live = z["source_ids"] >= 0
            keys = z["item_ids"][live].tolist()
            if keys:
                self.upsert(keys, z["source_ids"][live].tolist(), z["vectors"][live])
            return len(keys)
        except Exception:  # noqa: BLE001 — corrupt delta
            return -1
