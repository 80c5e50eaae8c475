"""Sharded exact-scan query engine: per-chip partial top-k + all-gather merge.

The multi-chip form of the query path (SURVEY.md §2 "Corpus sharding for
search"): the embedding matrix is row-sharded over the whole mesh, each chip
scans ONLY its rows (Pallas kernel or einsum+top_k), and the per-chip (Q, k)
candidates are merged with one all_gather + tiny top-k — all inside a single
compiled program, so a query costs one collective of Q*k*(ndev) floats, not a
gather of full score rows.  This is the latency-critical design point: the
merge must live in the same program as the scan (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.topk import ALLOW_ALL, pallas_topk_unsorted
from .mesh import ROWS_AXES, rows_1d_sharding, rows_sharding


def _local_topk_xla(m_shard, src_shard, qc, allowed, k: int):
    """Per-shard exact scan, pure XLA (runs anywhere, incl. CPU test mesh)."""
    scores = jax.lax.dot_general(
        qc, m_shard, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    valid = src_shard >= 0
    ok = jnp.isin(src_shard, allowed) | (allowed[0] == ALLOW_ALL)
    scores = jnp.where((valid & ok)[None, :], scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "engine", "interpret")
)
def _sharded_scan(matrix, source_ids, q, allowed, *, mesh, k, engine, interpret):
    ndev = mesh.size

    def local(m_shard, src_shard, q_, allowed_):
        qc = q_.astype(m_shard.dtype)
        if engine == "pallas":
            src2d = src_shard.reshape(1, -1)
            vals, rows = pallas_topk_unsorted(m_shard, src2d, qc, allowed_, k, interpret)
        else:
            vals, rows = _local_topk_xla(m_shard, src_shard, qc, allowed_, k)
        # local row index -> global row index (shard offset); keep -1 invalid
        idx = jax.lax.axis_index(ROWS_AXES)
        rows = jnp.where(rows >= 0, rows + idx * m_shard.shape[0], -1)
        vals = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)
        # merge across chips: one small all-gather riding the ICI
        vals_all = jax.lax.all_gather(vals, ROWS_AXES)  # (ndev, Q, k)
        rows_all = jax.lax.all_gather(rows, ROWS_AXES)
        nq = q_.shape[0]
        vcat = jnp.transpose(vals_all, (1, 0, 2)).reshape(nq, ndev * k)
        rcat = jnp.transpose(rows_all, (1, 0, 2)).reshape(nq, ndev * k)
        mv, perm = jax.lax.top_k(vcat, k)
        return mv, jnp.take_along_axis(rcat, perm, axis=1)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ROWS_AXES, None), P(ROWS_AXES), P(None, None), P(None)),
        out_specs=(P(None, None), P(None, None)),
        # outputs ARE replicated (post-all_gather merge is identical on every
        # chip) but the checker can't infer that through top_k
        check_vma=False,
    )(matrix, source_ids, q, allowed)


def sharded_scan_topk(mesh, matrix, source_ids, q, allowed, k: int, engine: str = "xla"):
    """Exact top-k over a row-sharded matrix.

    matrix: (N, D) with rows_sharding(mesh); source_ids: (N,) likewise;
    q: (Q, D) f32 replicated; allowed: (F,) int32 source filter.
    Returns replicated ((Q, k) scores best-first, (Q, k) global row ids).
    """
    interpret = jax.default_backend() != "tpu"
    return _sharded_scan(
        matrix, source_ids, q, allowed, mesh=mesh, k=k, engine=engine, interpret=interpret
    )


class ShardedSearcher:
    """Mesh-wide Searcher: same API surface as index.Searcher for the query
    path, with the matrix row-sharded over every device.

    Composes the single-chip pieces: an EmbeddingMatrix whose device
    placements are NamedShardings, plus the shard_map scan above.  Capacity
    is kept a multiple of 512 * mesh.size so each shard's rows stay
    tile-aligned for the Pallas kernel.
    """

    def __init__(
        self,
        model_id: int,
        model_version: int,
        dim: int,
        mesh,
        *,
        dtype=jnp.bfloat16,
        engine: str = "auto",
    ):
        from ..index.matrix import EmbeddingMatrix

        self.model_id = model_id
        self.model_version = model_version
        self.mesh = mesh
        if engine == "auto":
            engine = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.engine = engine
        self.matrix = EmbeddingMatrix(
            dim,
            dtype=dtype,
            capacity=512 * mesh.size,
            device=rows_sharding(mesh),
            ids_device=rows_1d_sharding(mesh),
            row_align=512 * mesh.size,
        )

    def upsert_embeddings(self, item_ids, source_ids, vectors) -> None:
        """item_ids: plain ids or (item_id, chunk_idx) pairs (see
        index.Searcher.upsert_embeddings)."""
        from ..index.matrix import chunk_key

        keys = [
            chunk_key(*e) if isinstance(e, tuple) else chunk_key(int(e))
            for e in item_ids
        ]
        self.matrix.upsert(keys, source_ids, vectors)

    def remove_items(self, item_ids) -> int:
        keys = [k for iid in item_ids for k in self.matrix.keys_of_group(int(iid))]
        return self.matrix.remove(keys)

    def search_vectors_batch(
        self, vecs: np.ndarray, k: int, source_ids: Optional[Sequence[int]] = None
    ) -> list[list[tuple[int, float]]]:
        from ..index.searcher import MAX_SOURCE_FILTER, _k_bucket

        m = self.matrix
        if len(m) == 0:
            return [[] for _ in range(len(vecs))]
        q = np.asarray(vecs, dtype=np.float32)
        if m.padded_dim > m.dim:
            q = np.concatenate([q, np.zeros((q.shape[0], m.padded_dim - m.dim), q.dtype)], 1)
        allowed = np.full(MAX_SOURCE_FILTER, -9, dtype=np.int32)
        if source_ids is None:
            allowed[0] = ALLOW_ALL
        else:
            ids = list(source_ids)[:MAX_SOURCE_FILTER]
            allowed[: len(ids)] = ids
        kb = _k_bucket(k, m.rows)
        vals, rows = sharded_scan_topk(
            self.mesh,
            m.device_vectors,
            m.device_source_ids,
            jnp.asarray(q),
            jnp.asarray(allowed),
            kb,
            engine=self.engine,
        )
        from ..index.matrix import key_item

        vals, rows = np.asarray(vals), np.asarray(rows)
        out = []
        for qi in range(len(q)):
            hits = []
            seen: set[int] = set()
            for score, row in zip(vals[qi], rows[qi]):
                if not np.isfinite(score) or len(hits) >= k:
                    break
                key = int(m.item_ids[row])
                if key < 0:
                    continue
                iid = key_item(key)
                if iid in seen:
                    continue
                seen.add(iid)
                hits.append((iid, float(score)))
            out.append(hits)
        return out

    def search_vector(self, vec, k: int, source_ids=None) -> list[tuple[int, float]]:
        return self.search_vectors_batch(np.asarray(vec).reshape(1, -1), k, source_ids)[0]
