"""Sharded exact-scan query engine: per-chip partial top-k + all-gather merge.

The multi-chip form of the query path (SURVEY.md §2 "Corpus sharding for
search"): the embedding matrix is row-sharded over the whole mesh, each chip
scans ONLY its rows (Pallas kernel or einsum+top_k), and the per-chip (Q, k)
candidates are merged with one all_gather + tiny top-k — all inside a single
compiled program, so a query costs one collective of Q*k*(ndev) floats, not a
gather of full score rows.  This is the latency-critical design point: the
merge must live in the same program as the scan (SURVEY.md §7 hard parts).

ShardedSearcher subclasses index.Searcher: build/rebuild/snapshots/retrieve/
chunk-dedupe/int8-rerank are all inherited — only the matrix placement
(NamedShardings over the mesh) and the device sweep differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..index.searcher import Searcher
from ..ops.topk import (
    QUERY_SLAB,
    pallas_topk_int4_slabbed,
    pallas_topk_int4_unsorted,
    pallas_topk_int8_slabbed,
    pallas_topk_int8_unsorted,
    pallas_topk_int8t_slabbed,
    pallas_topk_int8t_unsorted,
    pallas_topk_slabbed,
    pallas_topk_unsorted,
    _slab_pad,
    MAX_QUERY_SLAB,
    mask_scores,
    quantize_queries,
    scan_int2_coarse_fine,
    xla_scores_int4,
    xla_scores_int8,
    xla_scores_int8t,
)


from .mesh import ROWS_AXES, rows_1d_sharding, rows_sharding


def _slabbable(q) -> bool:
    """Large batches route through the query-slabbed kernels inside the
    shard_map local body too (VERDICT r2 #5: round 2 forfeited the measured
    slab win multi-chip by always calling the flat kernels)."""
    return q.shape[0] >= 2 * QUERY_SLAB and q.shape[0] % QUERY_SLAB == 0


def _local_topk_xla(scores, k: int):
    return jax.lax.top_k(scores, k)


def _merge_local_candidates(vals, rows, *, k, ndev, n_local):
    """Shared merge tail of every shard_map local body: globalize the local
    row indices (shard offset via axis_index), all_gather the per-chip
    (Q, kl) candidates, and keep the global top-k — ONE implementation so
    the tiers can never drift on the -inf sanitization / k-padding rules."""
    idx = jax.lax.axis_index(ROWS_AXES)
    rows = jnp.where(rows >= 0, rows + idx * n_local, -1)
    vals = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)
    vals_all = jax.lax.all_gather(vals, ROWS_AXES)  # (ndev, Q, kl)
    rows_all = jax.lax.all_gather(rows, ROWS_AXES)
    nq, kl = vals.shape
    vcat = jnp.transpose(vals_all, (1, 0, 2)).reshape(nq, ndev * kl)
    rcat = jnp.transpose(rows_all, (1, 0, 2)).reshape(nq, ndev * kl)
    mv, perm = jax.lax.top_k(vcat, min(k, ndev * kl))
    out = jnp.take_along_axis(rcat, perm, axis=1)
    if mv.shape[1] < k:  # k exceeded the global row count: pad
        pad = k - mv.shape[1]
        mv = jnp.pad(mv, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        out = jnp.pad(out, ((0, 0), (0, pad)), constant_values=-1)
    return mv, out


# filter semantics live in ONE home (ops.topk.mask_scores, review r3); the
# sharded XLA branches must never drift from the single-chip engines
_mask_scores = mask_scores


def _sharded_scan_body(matrix, scales, source_ids, q, allowed, *, mesh, k, engine, interpret, int8t=False):
    ndev = mesh.size
    # ``int8t`` must be a STATIC caller flag: the int2 tier's transposed
    # (D, N) int8 fine companion has the same dtype as the row-major int8
    # tier's (N, D) matrix, so dtype alone cannot pick the layout
    int8 = matrix.dtype == jnp.int8 and not int8t
    int4 = matrix.dtype == jnp.uint8  # transposed-packed (D/2, N), ops/topk.py
    transposed = int4 or int8t

    def local(m_shard, sc_shard, src_shard, q_, allowed_):
        n_local = m_shard.shape[1] if transposed else m_shard.shape[0]
        # the per-chip candidate count can't exceed the shard's rows:
        # lax.top_k rejects k > n, and an over-fetch bucket (escalation,
        # chunk dedupe) can legitimately exceed a small shard.  The gathered
        # width ndev * kl still covers k because the caller caps k at the
        # GLOBAL row count (ndev * n_local).
        kl = min(k, n_local)
        # large unaligned batches slab here too: the flat kernels' (Q, TILE)
        # VMEM scratch scales with Q and fails Mosaic compilation near
        # Q~2k (ops/topk._slab_pad measured it single-chip; the shard_map
        # local body bypasses those wrappers, review r3).  Padded zero
        # queries are sliced back off before the all-gather merge.  The
        # pad is a Pallas VMEM constraint only — the XLA engine would just
        # sweep/sort up to 127 dead queries per shard for nothing.
        nq0 = q_.shape[0]
        pad = _slab_pad(nq0) if engine == "pallas" else 0
        if pad:
            q_ = jnp.pad(q_, ((0, pad), (0, 0)))
        if int4:
            qi8, qscale = quantize_queries(q_)
            if engine == "pallas":
                kern = pallas_topk_int4_slabbed if _slabbable(q_) else pallas_topk_int4_unsorted
                vals, rows = kern(
                    m_shard, sc_shard.reshape(1, -1), src_shard.reshape(1, -1),
                    qi8, qscale, allowed_, kl, interpret,
                )
            else:
                scores = xla_scores_int4(m_shard, sc_shard, qi8, qscale)
                vals, rows = _local_topk_xla(_mask_scores(scores, src_shard, allowed_), kl)
        elif int8t:
            qi8, qscale = quantize_queries(q_)
            if engine == "pallas":
                kern = pallas_topk_int8t_slabbed if _slabbable(q_) else pallas_topk_int8t_unsorted
                vals, rows = kern(
                    m_shard, sc_shard.reshape(1, -1), src_shard.reshape(1, -1),
                    qi8, qscale, allowed_, kl, interpret,
                )
            else:
                scores = xla_scores_int8t(m_shard, sc_shard, qi8, qscale)
                vals, rows = _local_topk_xla(_mask_scores(scores, src_shard, allowed_), kl)
        elif int8:
            qi8, qscale = quantize_queries(q_)
            if engine == "pallas":
                kern = pallas_topk_int8_slabbed if _slabbable(q_) else pallas_topk_int8_unsorted
                vals, rows = kern(
                    m_shard, sc_shard.reshape(1, -1), src_shard.reshape(1, -1),
                    qi8, qscale, allowed_, kl, interpret,
                )
            else:
                scores = xla_scores_int8(m_shard, sc_shard, qi8, qscale)
                vals, rows = _local_topk_xla(_mask_scores(scores, src_shard, allowed_), kl)
        else:
            qc = q_.astype(m_shard.dtype)
            if engine == "pallas":
                kern = pallas_topk_slabbed if _slabbable(qc) else pallas_topk_unsorted
                vals, rows = kern(
                    m_shard, src_shard.reshape(1, -1), qc, allowed_, kl, interpret
                )
            else:
                scores = jax.lax.dot_general(
                    qc, m_shard, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                vals, rows = _local_topk_xla(_mask_scores(scores, src_shard, allowed_), kl)
        if pad:
            vals, rows = vals[:nq0], rows[:nq0]
        # merge across chips: one small all-gather riding the ICI
        return _merge_local_candidates(vals, rows, k=k, ndev=ndev, n_local=n_local)

    m_spec = P(None, ROWS_AXES) if transposed else P(ROWS_AXES, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(m_spec, P(ROWS_AXES), P(ROWS_AXES), P(None, None), P(None)),
        out_specs=(P(None, None), P(None, None)),
        # outputs ARE replicated (post-all_gather merge is identical on every
        # chip) but the checker can't infer that through top_k
        check_vma=False,
    )(matrix, scales, source_ids, q, allowed)


_sharded_scan = functools.partial(
    jax.jit, static_argnames=("mesh", "k", "engine", "interpret", "int8t")
)(_sharded_scan_body)


@functools.partial(jax.jit, static_argnames=("mesh", "k", "engine", "interpret"))
def _sharded_scan_unquantized(matrix, source_ids, q, allowed, *, mesh, k, engine, interpret):
    """bf16/f32 tier entry that builds the placeholder scales INSIDE the
    program (XLA materializes per-shard zeros for free) instead of
    allocating + host->device-transferring an O(N) zeros array per call
    (review r3; the fused builder already did it this way)."""
    scales = jnp.zeros((matrix.shape[0],), jnp.float32)
    return _sharded_scan_body(
        matrix, scales, source_ids, q, allowed,
        mesh=mesh, k=k, engine=engine, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "engine", "interpret", "fine_bits", "select", "fetch"),
)
def _sharded_scan_int2(
    packed2, cscales, packed4, fscales, source_ids, q, allowed,
    *, mesh, k, engine, interpret, fine_bits=4, select="auto", fetch=0,
):
    """Sharded int2 coarse-to-fine: each chip runs the COMPLETE single-chip
    pipeline (2-bit sweep -> exact hierarchical select -> in-jit fine
    rescore, ops/topk.scan_int2_coarse_fine) on its row shard, then the
    per-chip (Q, kl) fine candidates merge with the same all_gather +
    tiny top-k as every other tier.  ``fine_bits`` matches the companion's
    storage (matrix.fine_bits).  Returns (vals, rows, floor) where
    ``floor`` is the MAX over shards of the per-shard coarse floor.

    Soundness of the escalation bound, precisely (what Searcher._scan
    consumes): a row outside EVERY shard's coarse candidate set scores at
    most its own shard's kc-th coarse score <= this max-merged floor —
    that is the half ``floor`` covers.  A row INSIDE some shard's coarse
    (or fine) set but dropped by the global top-k merge is NOT bounded by
    the coarse floor; it is bounded by the merged kb-th int4 value, which
    _scan's separate ``buffer_full`` trigger (kth exact < vals[:, -1])
    already checks — the same two-trigger structure as the single-chip
    int2 tier, where the fine buffer's last int4 score plays that role.
    Neither trigger may be removed for this tier, and the floors must
    max-merge (a min would under-bound rows on the max shard)."""
    ndev = mesh.size

    def local(p2, s2, p4, s4, src, q_, allowed_):
        n_local = p2.shape[1]
        kl = min(k, n_local)
        vals, rows, floor = scan_int2_coarse_fine(
            p2, s2, p4, s4, src, q_, allowed_, kl,
            engine=engine, interpret=interpret, fine_bits=fine_bits,
            select=select, fetch=fetch,
        )
        floor_all = jax.lax.all_gather(floor, ROWS_AXES)  # (ndev, Q)
        gfloor = jnp.max(floor_all, axis=0)
        mv, out = _merge_local_candidates(vals, rows, k=k, ndev=ndev, n_local=n_local)
        return mv, out, gfloor

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, ROWS_AXES),  # coarse (D/4, N) transposed-packed
            P(ROWS_AXES),
            P(None, ROWS_AXES),  # fine (D/2 or D, N) transposed
            P(ROWS_AXES),
            P(ROWS_AXES),
            P(None, None),
            P(None),
        ),
        out_specs=(P(None, None), P(None, None), P(None)),
        check_vma=False,  # see _sharded_scan
    )(packed2, cscales, packed4, fscales, source_ids, q, allowed)


def sharded_scan_topk(mesh, matrix, source_ids, q, allowed, k: int, engine: str = "xla", scales=None):
    """Exact top-k over a row-sharded matrix.

    matrix: (N, D) with rows_sharding(mesh); source_ids: (N,) likewise;
    q: (Q, D) f32 replicated; allowed: (F,) int32 source filter; scales:
    (N,) f32 per-row scales for int8 matrices (required when dtype is int8).
    Returns replicated ((Q, k) scores best-first, (Q, k) global row ids).
    """
    from ..utils.platform import platform_of

    if q.shape[0] > MAX_QUERY_SLAB:  # split oversized batches (see ops.topk)
        outs = [
            sharded_scan_topk(
                mesh, matrix, source_ids, q[s : s + MAX_QUERY_SLAB], allowed, k,
                engine=engine, scales=scales,
            )
            for s in range(0, q.shape[0], MAX_QUERY_SLAB)
        ]
        return (
            jnp.concatenate([v for v, _ in outs], axis=0),
            jnp.concatenate([r for _, r in outs], axis=0),
        )
    interpret = platform_of(mesh) != "tpu"  # keyed on the mesh's devices
    if scales is None:
        if matrix.dtype in (jnp.int8, jnp.uint8):
            # all-zero placeholder scales would multiply every quantized dot
            # by 0 and silently return the first-kb rows (review r3)
            raise ValueError("scales are required for quantized matrices")
        return _sharded_scan_unquantized(
            matrix, source_ids, q, allowed, mesh=mesh, k=k, engine=engine,
            interpret=interpret,
        )
    return _sharded_scan(
        matrix, scales, source_ids, q, allowed, mesh=mesh, k=k, engine=engine,
        interpret=interpret,
    )


def _build_fused_sharded(model, searcher, aux_model=None, *, use_coarse=True, select="auto", fetch=0):
    """ONE compiled program for a text query on the MESH: token ids ->
    encoder (replicated params, or GSPMD-partitioned under TP) -> the
    shard_map per-chip scan + all_gather merge (_sharded_scan) -> top-k.
    Same contract as index.searcher._build_fused_search, including the
    ``aux_model`` variant (the highlights-model query encode rides the same
    dispatch; its params are replicated onto the mesh ONCE by
    ShardedSearcher._fused_aux_params, not per call)."""
    from ..utils.platform import platform_of

    m = searcher.matrix
    mesh = searcher.mesh
    engine = searcher.engine
    interpret = platform_of(mesh) != "tpu"
    dim, padded = m.dim, m.padded_dim
    quantized = m.quantized
    bits = m.quant_bits
    # ``use_coarse`` is baked at build time and part of the fused cache key
    # (searcher._fused_lookup, shared with the single-chip builder): audit
    # demotion or the depth rule selects the fine-companion program
    encode_ids = model._encode_ids_fn

    def scan(vectors, source_ids, scales, qp, allowed, k):
        if bits == 2:
            p2, p4 = vectors
            s2, s4 = scales
            fine8 = p4.dtype == jnp.int8
            if use_coarse:
                return _sharded_scan_int2(
                    p2, s2, p4, s4, source_ids, qp, allowed,
                    mesh=mesh, k=k, engine=engine, interpret=interpret,
                    fine_bits=8 if fine8 else 4, select=select, fetch=fetch,
                )
            vals, rows = _sharded_scan(
                p4, s4, source_ids, qp, allowed,
                mesh=mesh, k=k, engine=engine, interpret=interpret,
                int8t=fine8,
            )
            return vals, rows, None
        if not quantized:
            scales_arr = jnp.zeros((vectors.shape[0],), jnp.float32)
        else:
            scales_arr = scales
        vals, rows = _sharded_scan(
            vectors, scales_arr, source_ids, qp, allowed,
            mesh=mesh, k=k, engine=engine, interpret=interpret,
        )
        return vals, rows, None

    if aux_model is not None:
        aux_encode_ids = aux_model._encode_ids_fn

        def fused_aux(params, ids, aux_params, aux_ids, vectors, source_ids,
                      scales, allowed, k: int, n_sweep: int = 0):
            # n_sweep (the live-row prefix) is accepted for signature parity
            # with the single-chip fused program but IGNORED: rows are
            # BLOCK-sharded and allocated sequentially, so whenever the
            # corpus exceeds one shard the fullest shard is at capacity and
            # sets the latency — a uniform per-shard prefix would win
            # nothing (dead rows carry src=-1 and mask out)
            q = encode_ids(params, ids).astype(jnp.float32)  # (1, dim)
            aq = aux_encode_ids(aux_params, aux_ids).astype(jnp.float32)
            qp = q if padded == dim else jnp.pad(q, ((0, 0), (0, padded - dim)))
            vals, rows, floor = scan(vectors, source_ids, scales, qp, allowed, k)
            return q, aq, vals, rows, floor

        return jax.jit(fused_aux, static_argnames=("k", "n_sweep"))

    def fused(params, ids, vectors, source_ids, scales, allowed, k: int, n_sweep: int = 0):
        q = encode_ids(params, ids).astype(jnp.float32)  # (1, dim)
        qp = q if padded == dim else jnp.pad(q, ((0, 0), (0, padded - dim)))
        vals, rows, floor = scan(vectors, source_ids, scales, qp, allowed, k)
        return q, vals, rows, floor

    return jax.jit(fused, static_argnames=("k", "n_sweep"))


class ShardedSearcher(Searcher):
    """Mesh-wide Searcher: identical API/semantics to index.Searcher with the
    matrix row-sharded over every device and the sweep running under
    shard_map.  Capacity stays a multiple of 512 * mesh.size so each shard's
    rows remain tile-aligned for the Pallas kernel.

    Text queries fuse here too: the fused program encodes the query
    (replicated, or GSPMD-partitioned under TP params) and runs the
    shard_map scan + all_gather merge in the SAME compiled dispatch
    (_build_fused_sharded)."""

    _fused_takes_sweep = False  # see Searcher: mesh sweep ignores n_sweep

    def _fused_callable(self, model, aux_model=None, *, use_coarse=None):  # type: ignore[override]
        return self._fused_lookup(
            model, _build_fused_sharded, aux_model, use_coarse=use_coarse
        )

    def _fused_aux_params(self, aux_model):  # type: ignore[override]
        """Replicate the aux (highlights) model's params onto the mesh ONCE
        and reuse them — passing its default-placement params into the mesh
        program would re-transfer ~the whole model every query.  Single
        weakref slot: a swapped-in aux model (``model set``) re-replicates;
        the old copy is freed with the entry."""
        import weakref

        entry = self._aux_repl
        if entry is not None and entry[0]() is aux_model:
            return entry[1]
        if entry is not None and entry[0]() is None:
            # the old aux model was garbage-collected: release its
            # mesh-replicated params NOW rather than holding multi-hundred-MB
            # device copies until the replacement lands (review r3)
            self._aux_repl = None
        from .mesh import replicated

        params = jax.device_put(aux_model.params, replicated(self.mesh))
        self._aux_repl = (weakref.ref(aux_model), params)
        return params

    def _fused_put(self, x):  # type: ignore[override]
        from .mesh import replicated

        return jax.device_put(np.asarray(x), replicated(self.mesh))

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
        from ..utils.platform import platform_of

        if engine == "auto":
            # resolve from the mesh's platform, not the default backend (the
            # base class would key on the default device, which can differ)
            engine = "pallas" if platform_of(mesh) == "tpu" else "xla"
        matrix = EmbeddingMatrix(
            dim,
            dtype=dtype,
            capacity=512 * mesh.size,
            device=rows_sharding(mesh),
            ids_device=rows_1d_sharding(mesh),
            row_align=512 * mesh.size,
        )
        super().__init__(
            model_id, model_version, dim, dtype=dtype, engine=engine, matrix=matrix
        )
        self.mesh = mesh
        self._aux_repl = None  # (aux weakref, mesh-replicated params)

    @staticmethod
    def auto_tier(n_rows: int, mesh, padded_dim: int = 384):
        """Auto tier keyed on PER-CHIP rows, not the global count: every
        threshold in auto_matrix_dtype is a per-chip concern — the
        bf16/int8/int2 crossovers are absolute per-chip sweep latencies
        (the int2 selection's ~0.5 ms fixed cost only pays off above ~4M
        rows *on the chip that runs it*) and the 24M int4-capacity bound is
        per-chip HBM.  An 80M-row corpus on 8 chips is 10M rows/chip — the
        int2 latency regime — where the global count would wrongly pick
        the int4 capacity tier.  The ONE rule shared by AppState's startup
        choice and _maybe_retier, so the startup tier can never diverge
        from what the first mid-session retier would pick (which would
        restage a multi-GB corpus right after every boot)."""
        from ..index.matrix import auto_matrix_dtype

        return auto_matrix_dtype(-(-max(n_rows, 0) // mesh.size), padded_dim)

    def _tier_for(self, n_rows: int):  # type: ignore[override]
        return self.auto_tier(n_rows, self.mesh, self.matrix.padded_dim)

    def _approx_bins(self, fetch: int = 0):  # type: ignore[override]
        """TOTAL PartialReduce bins across the mesh: each shard runs the
        approx select at its own (n_local, kc) operating point, and the
        audit's risk estimate divides a GLOBAL rank by these — valid when
        reference rows spread ~uniformly over shards (block-sharded rows;
        a dense cluster concentrated on one shard is covered by the
        10x per-query max gate)."""
        from ..ops.topk import _INT2_APPROX_RT, INT2_COARSE_FETCH

        ndev = self.mesh.size
        n_local = self.matrix.capacity // ndev
        kc = min(fetch or INT2_COARSE_FETCH, n_local)
        if kc >= n_local:
            return None
        try:
            buf, _ = jax.eval_shape(
                lambda x: jax.lax.approx_max_k(
                    x, kc, recall_target=_INT2_APPROX_RT,
                    aggregate_to_topk=False,
                ),
                jax.ShapeDtypeStruct((n_local,), jnp.float32),
            )
            return ndev * int(buf.shape[0])
        except Exception:  # noqa: BLE001 — no lowering info: fail safe
            return 0

    def _audit_rank_counts(self, q1: np.ndarray, rows: np.ndarray):  # type: ignore[override]
        """Global coarse-score ranks via a shard_map psum (each reference
        row lives on exactly one block shard).  Batched like the base
        class: ``q1`` (B, D), ``rows`` (B, k) -> (B, k)."""
        m = self.matrix
        if not m.packed2:
            return None
        from ..utils.platform import platform_of

        mesh = self.mesh
        engine = self.engine
        interpret = engine == "pallas" and platform_of(mesh) != "tpu"

        def local(p2_, s2_, src_, q_, allowed_, rows_):
            n_local = p2_.shape[1]
            qi8, qscale = quantize_queries(q_)
            if engine == "pallas":
                from ..ops.topk import pallas_int2_scores

                coarse = pallas_int2_scores(
                    p2_, s2_.reshape(1, n_local), src_.reshape(1, n_local),
                    qi8, qscale, allowed_, interpret, n_local,
                )
            else:
                from ..ops.topk import xla_scores_int2

                coarse = mask_scores(
                    xla_scores_int2(p2_, s2_, qi8, qscale), src_, allowed_
                )
            off = jax.lax.axis_index(ROWS_AXES) * n_local
            loc = rows_ - off  # (B, k)
            valid = (loc >= 0) & (loc < n_local) & (rows_ >= 0)
            thr_loc = jnp.where(
                valid,
                jnp.take_along_axis(
                    coarse, jnp.clip(loc, 0, n_local - 1), axis=1
                ),
                0.0,
            )
            thr = jax.lax.psum(thr_loc, ROWS_AXES)  # one shard contributes
            # static-k loop keeps memory at the (B, n_local) score buffer
            counts_loc = jnp.stack(
                [
                    jnp.sum(
                        (coarse >= thr[:, j : j + 1]).astype(jnp.int32), axis=1
                    )
                    for j in range(rows_.shape[1])
                ],
                axis=1,
            )
            counts = jax.lax.psum(counts_loc, ROWS_AXES)
            return jnp.where(rows_ >= 0, counts, 0)  # padded slots count 0

        with m._lock:
            vectors, source_ids, scales = m.device_view()
            p2, _ = vectors
            s2, _ = scales
            q_dev = self._fused_put(np.asarray(q1, np.float32))
            a_dev = self._fused_put(self._allowed_arrays(None)[0])
            r_dev = self._fused_put(np.asarray(rows, np.int32))
            counts = shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P(None, ROWS_AXES), P(ROWS_AXES), P(ROWS_AXES),
                    P(None, None), P(None), P(None, None),
                ),
                out_specs=P(None, None),
                check_vma=False,
            )(p2, s2, source_ids, q_dev, a_dev, r_dev)
        return np.asarray(counts)

    @classmethod
    def build(cls, db, model_id, model_version, dim, mesh, *, use_snapshot=True, **kw):  # type: ignore[override]
        s = cls(model_id, model_version, dim, mesh, **kw)
        if use_snapshot and s._load_snapshot(db):
            s._audit_coarse_if_stale()
            return s
        s._load(db, extra_sql="", params=())
        s._audit_coarse_if_stale()
        return s

    def _device_scan(
        self, qp: np.ndarray, kb: int, allowed: np.ndarray, engine: str,
        use_coarse: bool = True, force_coarse: bool = False,
    ):
        """Mesh-wide sweep (overrides Searcher._device_scan; the shared _scan
        orchestration — padding, k-bucketing, int8 rerank + over-fetch
        escalation — lives in the base class.  The escalation floor check is
        valid here because the merged kb-th score dominates every chip's
        local kb-th floor).

        Int2 routing mirrors the base class: single queries with a trusted
        coarse pass run the sharded coarse-to-fine program
        (_sharded_scan_int2); batches, escalations, and audit demotions
        sweep the fine companion through the matching sharded kernels
        (int8t for an int8 companion, else the int4 kernels on the
        byte-identical int4 layout)."""
        from ..index.searcher import _INT2_MAX_Q
        from ..utils.platform import platform_of
        from .mesh import replicated

        if qp.shape[0] > MAX_QUERY_SLAB:
            # beyond the slab cap even the slabbed kernels run out of VMEM;
            # split into consecutive sweeps exactly like the single-chip
            # wrappers (review r3: the mesh path bypassed them)
            outs = [
                self._device_scan(
                    qp[s : s + MAX_QUERY_SLAB], kb, allowed, engine, use_coarse,
                    force_coarse,
                )
                for s in range(0, qp.shape[0], MAX_QUERY_SLAB)
            ]
            floors = [o[2] for o in outs]
            return (
                np.concatenate([o[0] for o in outs], axis=0),
                np.concatenate([o[1] for o in outs], axis=0),
                None
                if all(f is None for f in floors)
                else np.concatenate(
                    [
                        np.full(o[0].shape[0], -np.inf, np.float32) if f is None else f
                        for o, f in zip(outs, floors)
                    ]
                ),
            )
        m = self.matrix
        rep = replicated(self.mesh)
        floor = None
        # dispatch under the matrix lock so a concurrent incremental sync's
        # donating scatter cannot invalidate the captured arrays before the
        # kernel is enqueued (enqueued executions pin their buffers; the race
        # was Python-side capture->donate->launch).  Materialize outside.
        with m._lock:
            vectors, source_ids, scales = m.device_view()  # atomic capture
            # explicit mesh placement: uncommitted jnp arrays would land on
            # the DEFAULT device, which may be a different platform
            q_dev = jax.device_put(np.asarray(qp, np.float32), rep)
            a_dev = jax.device_put(np.asarray(allowed, np.int32), rep)
            if m.packed2:
                p2, p4 = vectors
                s2, s4 = scales
                fine8 = p4.dtype == jnp.int8
                interpret = platform_of(self.mesh) != "tpu"
                if (qp.shape[0] > _INT2_MAX_Q and not force_coarse) or not use_coarse:
                    vals, rows = _sharded_scan(
                        p4, s4, source_ids, q_dev, a_dev,
                        mesh=self.mesh, k=kb, engine=engine, interpret=interpret,
                        int8t=fine8,
                    )
                else:
                    vals, rows, fl = _sharded_scan_int2(
                        p2, s2, p4, s4, source_ids, q_dev, a_dev,
                        mesh=self.mesh, k=kb, engine=engine, interpret=interpret,
                        fine_bits=8 if fine8 else 4, select=m.coarse_select,
                        fetch=m.coarse_fetch,
                    )
                    floor = fl
            else:
                vals, rows = sharded_scan_topk(
                    self.mesh, vectors, source_ids, q_dev, a_dev, kb,
                    engine=engine, scales=scales if m.quantized else None,
                )
        return (
            np.asarray(vals),
            np.asarray(rows),
            None if floor is None else np.asarray(floor),
        )
