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

import threading
from typing import Sequence

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

# Row keys are (item_id, chunk_idx) packed as item_id * CHUNK_STRIDE +
# chunk_idx, so one item's chunk vectors group under integer division.
CHUNK_STRIDE = 4096


def chunk_key(item_id: int, chunk_idx: int = 0) -> int:
    return item_id * CHUNK_STRIDE + chunk_idx


def key_item(key: int) -> int:
    return key // CHUNK_STRIDE


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scatter_rows_impl(matrix, rows, vals):
    return matrix.at[rows].set(vals)


# donation lets XLA update the (potentially GBs) matrix in place
_scatter_rows = jax.jit(_scatter_rows_impl, donate_argnums=(0,))
_scatter_vals = jax.jit(_scatter_rows_impl, donate_argnums=(0,))


def _scatter_cols_impl(matrix, cols, vals):
    return matrix.at[:, cols].set(vals)


# column scatter for the transposed int4 packed matrix
_scatter_cols = jax.jit(_scatter_cols_impl, donate_argnums=(0,))


def serialize_embedding(vec: np.ndarray) -> bytes:
    """f32 little-endian BLOB, byte-compatible with the reference store
    (search.rs:281-287)."""
    return np.ascontiguousarray(vec, dtype="<f4").tobytes()


def deserialize_embedding(blob: bytes) -> np.ndarray:
    """(reference search.rs:289-294)"""
    return np.frombuffer(blob, dtype="<f4").copy()


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

        self.rows = 0  # high-water mark of allocated rows
        # tombstoned rows available for reuse — without this, rebuild/churn
        # grows capacity without bound (ADVICE r1: matrix.py:275)
        self._free: list[int] = []
        # bumped whenever a freed row is RE-allocated to a new key: a search
        # that captured device arrays before the reuse could decode that row
        # as the new item with the old item's score.  Searchers snapshot this
        # before a sweep and retry when it moved (index/searcher._scan docs).
        self.reuse_gen = 0
        # high-water quantization stats for the rerank escalation margin
        # (index/searcher._scan): the largest per-row quantization scale and
        # the largest row L2 norm ever upserted.  High-water (never lowered
        # on remove) keeps them conservative.
        self.scale_hw = 0.0
        self.norm_hw = 0.0
        self.row_of: dict[int, int] = {}
        # key-group index: item id -> set of chunk keys currently stored
        self.groups: dict[int, set[int]] = {}
        # number of groups holding >1 chunk key (searchers over-fetch
        # candidates when any document is chunk-embedded; maintained here so
        # queries never walk the groups dict)
        self.multi_chunk_groups = 0
        self.item_ids = np.full(self.capacity, -1, dtype=np.int64)
        self.source_ids = np.full(self.capacity, -1, dtype=np.int32)
        # host mirror of vectors (f32) so growth/snapshots never read device
        self._host_vectors = np.zeros((self.capacity, self.padded_dim), dtype=np.float32)
        self._dirty = True  # full re-upload needed (first sync / growth)
        self._dirty_rows: set[int] = set()  # incremental row updates
        self._device_vectors = None
        self._device_source_ids = None
        self._device_scales = None  # (capacity,) f32 per-row scales, int8 mode

    @property
    def packed4(self) -> bool:
        return isinstance(self.dtype, str) and self.dtype == INT4

    @property
    def quantized(self) -> bool:
        return self.packed4 or self.dtype == jnp.int8

    @property
    def quant_bits(self) -> int:
        """Bits per stored dim: 4 (packed), 8 (int8), 0 (not quantized)."""
        return 4 if self.packed4 else (8 if self.dtype == jnp.int8 else 0)

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

    # -- device views -------------------------------------------------------

    def _vectors_device(self):
        """Placement for the vectors array.  The int4 matrix is stored
        TRANSPOSED (D/2, capacity), so a row sharding like P(rows, None) must
        become P(None, rows) — metadata arrays keep the original spec."""
        if not self.packed4:
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
                host = self._host_vectors
                if self.packed4:
                    packed, scales = self._quantize4(host)
                    self._device_scales = jax.device_put(jnp.asarray(scales), self.ids_device)
                    host = np.ascontiguousarray(packed.T)  # (D/2, capacity)
                elif self.quantized:
                    host, scales = self._quantize(host)
                    self._device_scales = jax.device_put(jnp.asarray(scales), self.ids_device)
                elif self.dtype != jnp.float32:
                    host = host.astype(jax.dtypes.canonicalize_dtype(self.dtype))
                self._device_vectors = jax.device_put(host, self._vectors_device())
                self._device_source_ids = jax.device_put(
                    jnp.asarray(self.source_ids), self.ids_device
                )
            else:
                rows = np.fromiter(self._dirty_rows, dtype=np.int32)
                vals = self._host_vectors[rows]
                if self.packed4:
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
            return self._device_vectors, self._device_source_ids, self._device_scales

    def host_vectors_for(self, rows) -> np.ndarray:
        """f32 host mirror rows (exact rerank of quantized candidates)."""
        return self._host_vectors[rows, : self.dim]

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
        self._host_vectors = np.concatenate(
            [
                self._host_vectors,
                np.zeros((new_cap - self.capacity, self.padded_dim), dtype=np.float32),
            ]
        )
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
                g = self.groups.setdefault(k // CHUNK_STRIDE, set())
                before = len(g)
                g.add(k)
                if before == 1 and len(g) == 2:
                    self.multi_chunk_groups += 1
            self.item_ids[rows] = item_ids
            self.source_ids[rows] = source_ids
            self._host_vectors[rows, : self.dim] = vectors
            if self.padded_dim > self.dim:
                self._host_vectors[rows, self.dim :] = 0.0
            self._dirty_rows.update(rows.tolist())
            if self.quantized and len(vectors):
                qmax = 7.0 if self.packed4 else 127.0
                self.scale_hw = max(self.scale_hw, float(np.abs(vectors).max()) / qmax)
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
                    self._dirty_rows.add(int(row))
                    self._free.append(int(row))
                    n += 1
        return n

    def keys_of_group(self, item_id: int) -> list[int]:
        """All chunk keys currently stored for an item."""
        return list(self.groups.get(item_id, ()))

    def remove_source(self, source_id: int) -> int:
        """Drop every row of a source (prelude to rebuild_source)."""
        with self._lock:
            rows = np.nonzero(self.source_ids[: self.rows] == source_id)[0]
            for row in rows:
                key = int(self.item_ids[row])
                self.row_of.pop(key, None)
                g = self.groups.get(key // CHUNK_STRIDE)
                if g is not None:
                    before = len(g)
                    g.discard(key)
                    if before == 2 and len(g) == 1:
                        self.multi_chunk_groups -= 1
                    if not g:
                        del self.groups[key // CHUNK_STRIDE]
                self.source_ids[row] = -1
                self.item_ids[row] = -1
                self._dirty_rows.add(int(row))
                self._free.append(int(row))
            return len(rows)

    def __len__(self) -> int:
        return len(self.row_of)

    # -- snapshots (vector_shards manifest) -----------------------------------

    def save_snapshot(self, path: str) -> None:
        """Persist to .npz for fast startup (device matrix reload without
        rescanning every embedding BLOB)."""
        with self._lock:
            np.savez(
                path,
                vectors=self._host_vectors[: self.rows, : self.dim],
                item_ids=self.item_ids[: self.rows],
                source_ids=self.source_ids[: self.rows],
                dim=self.dim,
            )

    @classmethod
    def load_snapshot(cls, path: str, *, dtype: jnp.dtype = jnp.bfloat16) -> "EmbeddingMatrix":
        z = np.load(path)
        dim = int(z["dim"])
        rows = len(z["item_ids"])
        m = cls(dim, dtype=dtype, capacity=max(rows, 1))
        live = z["source_ids"] >= 0
        m.upsert(
            z["item_ids"][live].tolist(),
            z["source_ids"][live].tolist(),
            z["vectors"][live],
        )
        return m
