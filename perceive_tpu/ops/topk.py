"""Fused exact-scan similarity + streaming top-k Pallas kernel.

TPU-native replacement for the reference's HNSW query fan-out
(/root/reference/crates/perceive-core/search.rs:157-182).  One kernel sweeps
the whole (N, D) embedding matrix tile by tile:

    per tile:  scores = Q @ tile.T        (MXU, bf16 x bf16 -> f32)
               mask invalid / filtered rows
               merge into a running (Q, K) top-k buffer     (VPU)

The top-k buffer lives in the output VMEM block (constant index_map, so the
same block is carried across all grid steps) — per-tile scores NEVER round-trip
to HBM, which is what makes the scan HBM-bandwidth-bound on the matrix read
alone (the speed-of-light for exact search).

Merge strategy: threshold-pruned selection.  Scores land in a VMEM scratch
(mutated in place — carrying the (Q, TILE) block through a while_loop would
copy it every iteration, measured ~1.2x whole-sweep cost at Q=512); the loop
carry is just (iteration, per-query tile max), so tiles that cannot
contribute (the overwhelming majority once the buffer is warm) cost one max
reduction + one cheap (Q, K) check.  Contributing tiles repeatedly move the
tile's max into the buffer's min slot — at most K iterations, usually 1-2.

Exactness: every row's score is computed and compared, so results match the
jnp.einsum + lax.top_k oracle bit-for-bit at equal dtypes (recall parity by
construction, see SURVEY.md §6).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALLOW_ALL = -2  # sentinel in allowed[0]: disable source filtering
_BIG = 2**30

# Row-tile candidates; EmbeddingMatrix capacity is always a multiple of 512
# (index/matrix.py ROW_ALIGN) so at least the last divides.  Bigger tiles
# amortize per-grid-step overhead: 8192 measured 630 GB/s of packed int4
# bytes vs 561 at 4096 on the bench device (the VMEM budget below keeps
# fat-dtype/batched kernels on smaller tiles automatically).
_TILES = (8192, 4096, 2048, 1024, 512)


# Tile-choice budget: pallas_call passes vmem_limit_bytes=14MB below, so
# sizing against 12MB leaves pipeline headroom while letting batch-512
# queries keep 2048-row tiles (small tiles pay per-grid-step overhead).
_VMEM_BUDGET = 12 * 1024 * 1024
_VMEM_LIMIT = 14 * 1024 * 1024


def _fits_vmem(t: int, nq: int, d: int, itemsize: int) -> bool:
    """Double-buffered matrix tiles + the (nq, TILE) f32 score scratch
    (mutated in place; never carried/copied through the merge loop).

    Fit formula for the FLAT kernels only, where nq < 2*QUERY_SLAB by
    construction (_slab_pad routes every larger batch to the slab kernels
    — measured: flat Q=2040 fails Mosaic compilation, the Q-scaled scratch
    + dot temporaries blow scoped VMEM).  The slab and sub-byte kernels
    have bespoke pickers (_pick_tile_slabbed, _pick_tile_int4*,
    _pick_tile_int8t_slabbed, _pick_tile_int2) that bill their extra dot
    temporaries explicitly."""
    return 2 * t * d * itemsize + nq * t * 4 <= _VMEM_BUDGET


def _pick_tile(n: int, nq: int = 1, d: int = 128, itemsize: int = 2) -> int:
    """Largest row tile that divides n AND fits VMEM."""
    for t in _TILES:
        if n % t:
            continue
        if _fits_vmem(t, nq, d, itemsize):
            return t
    if n % _TILES[-1] == 0:
        return _TILES[-1]
    raise ValueError(f"matrix rows {n} not a multiple of {_TILES[-1]}")


def _sweep_n(n: int, n_sweep: int) -> int:
    """Clamp a kernel's row sweep to the live-row prefix (the caller passes
    index/matrix.EmbeddingMatrix.sweep_rows).  Device arrays stay
    capacity-sized; the grid just stops after the first n_sweep rows, so
    dead rows past the high-water mark cost no HBM traffic.  0 = sweep all
    (raw-array callers: bench, probes, sharded per-shard bodies)."""
    if not n_sweep or n_sweep >= n:
        return n
    return n_sweep


def _argmax2d(x, iota):
    """(rows, idx) of the per-row max via the iota trick (2D keepdims only —
    avoids 1D argmax lowering in Mosaic).  Ties pick the lowest index."""
    m = jnp.max(x, axis=1, keepdims=True)
    idx = jnp.min(jnp.where(x == m, iota, _BIG), axis=1, keepdims=True)
    return m, idx


def _argmin2d(x, iota):
    m = jnp.min(x, axis=1, keepdims=True)
    idx = jnp.min(jnp.where(x == m, iota, _BIG), axis=1, keepdims=True)
    return m, idx


def _source_mask(src, allowed_ref, n_filter):
    """(1, TILE_N) row-validity & source-filter mask.  src -1 marks
    tombstones/unallocated; allowed[0] == ALLOW_ALL disables filtering."""
    ok = src == allowed_ref[0]
    for f in range(1, n_filter):
        ok = ok | (src == allowed_ref[f])
    return (src >= 0) & (ok | (allowed_ref[0] == ALLOW_ALL))


def _merge_tile_topk(sc_ref, vals_ref, rows_ref, qsl, base, k, n_iota, k_iota):
    """Threshold-pruned merge of the scratch scores into the running (Q, K)
    buffer (see module docstring).  ``qsl`` selects the query rows of the
    output buffer this scratch block corresponds to (slice(None) for flat
    kernels, the slab window for slabbed ones).  Loop carry is only
    (iteration, per-query tile max): tiles that cannot contribute cost one
    max + one (Q, K) min."""
    tv0 = jnp.max(sc_ref[:], axis=1, keepdims=True)

    def cond(state):
        j, tv = state
        return (j < k) & jnp.any(
            tv > jnp.min(vals_ref[qsl, :], axis=1, keepdims=True)
        )

    def body(state):
        j, tv = state
        sc = sc_ref[:]
        bv = vals_ref[qsl, :]
        ti = jnp.min(jnp.where(sc == tv, n_iota, _BIG), axis=1, keepdims=True)
        bmin, bpos = _argmin2d(bv, k_iota)  # (Q,1) buffer worst + its slot
        improve = tv > bmin
        sel = (k_iota == bpos) & improve
        vals_ref[qsl, :] = jnp.where(sel, tv, bv)
        rows_ref[qsl, :] = jnp.where(sel, base + ti, rows_ref[qsl, :])
        scn = jnp.where((n_iota == ti) & improve, -jnp.inf, sc)
        sc_ref[:] = scn
        return j + 1, jnp.max(scn, axis=1, keepdims=True)

    jax.lax.while_loop(cond, body, (jnp.int32(0), tv0))


def _scan_kernel(allowed_ref, q_ref, m_ref, src_ref, vals_ref, rows_ref, sc_ref, *, k, tile_n, n_filter):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    scores = jax.lax.dot_general(
        q_ref[:],
        m_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, TILE_N)

    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    # scores live in a VMEM scratch so the merge loop mutates in place —
    # carrying the (Q, TILE_N) block through a while_loop would copy it
    # every iteration
    sc_ref[:] = jnp.where(mask, scores, -jnp.inf)

    n_iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], k), 1)
    _merge_tile_topk(sc_ref, vals_ref, rows_ref, slice(None), t * tile_n, k, n_iota, k_iota)


def _scan_kernel_int8(
    allowed_ref, q_ref, qscale_ref, m_ref, src_ref, scales_ref, vals_ref, rows_ref,
    sc_ref, *, k, tile_n, n_filter,
):
    """Int8 variant: int8 x int8 -> int32 on the MXU, dequantized to f32 by
    per-row scales x per-query scale before the streaming merge.  Halves HBM
    bytes per sweep vs bf16 (the scan is bandwidth-bound, so ~2x QPS)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    iscores = jax.lax.dot_general(
        q_ref[:], m_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (Q, TILE_N) int32
    scores = iscores.astype(jnp.float32) * scales_ref[:] * qscale_ref[:]

    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    sc_ref[:] = jnp.where(mask, scores, -jnp.inf)

    n_iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], k), 1)
    _merge_tile_topk(sc_ref, vals_ref, rows_ref, slice(None), t * tile_n, k, n_iota, k_iota)


def _scan_kernel_int8_slabbed(
    allowed_ref, q_ref, qscale_ref, m_ref, src_ref, scales_ref, vals_ref, rows_ref,
    sc_ref, *, k, tile_n, n_filter, n_slabs,
):
    """Int8 large-batch variant (see _scan_kernel_slabbed)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    mask = _source_mask(src_ref[:], allowed_ref, n_filter)

    m_tile = m_ref[:]
    row_scales = scales_ref[:]
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (QUERY_SLAB, tile_n), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (QUERY_SLAB, k), 1)

    for s in range(n_slabs):
        lo = s * QUERY_SLAB
        qsl = slice(lo, lo + QUERY_SLAB)
        iscores = jax.lax.dot_general(
            q_ref[qsl, :], m_tile,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        )
        scores = iscores.astype(jnp.float32) * row_scales * qscale_ref[qsl, :]
        sc_ref[:] = jnp.where(mask, scores, -jnp.inf)
        _merge_tile_topk(sc_ref, vals_ref, rows_ref, qsl, t * tile_n, k, n_iota, k_iota)


def pallas_topk_int8_slabbed(matrix, scales2d, src2d, qi8, qscale, allowed, k: int, interpret: bool, n_sweep: int = 0):
    n, d = matrix.shape
    n = _sweep_n(n, n_sweep)
    nq = qi8.shape[0]
    tile_n = _pick_tile_slabbed(n, d, 1)
    kernel = functools.partial(
        _scan_kernel_int8_slabbed, k=k, tile_n=tile_n, n_filter=allowed.shape[0],
        n_slabs=nq // QUERY_SLAB,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((QUERY_SLAB, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d,
            bytes_accessed=n * d + n * 8 + nq * d,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(allowed, qi8, qscale, matrix, src2d, scales2d)


def pallas_topk_int8_unsorted(matrix, scales2d, src2d, qi8, qscale, allowed, k: int, interpret: bool, n_sweep: int = 0):
    """Raw int8 kernel invocation (unsorted buffer); callable inside
    jit/shard_map.  matrix (N,D) int8; scales2d (1,N) f32; qi8 (Q,D) int8;
    qscale (Q,1) f32."""
    n, d = matrix.shape
    n = _sweep_n(n, n_sweep)
    nq = qi8.shape[0]
    tile_n = _pick_tile(n, nq, d, 1)
    n_filter = allowed.shape[0]

    kernel = functools.partial(_scan_kernel_int8, k=k, tile_n=tile_n, n_filter=n_filter)
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # allowed (F,)
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((nq, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d,
            bytes_accessed=n * d + n * 8 + nq * d,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(allowed, qi8, qscale, matrix, src2d, scales2d)


def _pick_tile_slabbed(n: int, d: int, itemsize: int) -> int:
    """Row tile for the ROW-MAJOR slab kernels (bf16/f32 and int8): bills
    double-buffered (TILE, d) matrix tiles + one (SLAB, TILE) dot output +
    the (SLAB, TILE) f32 score scratch.  The generic _fits_vmem misses the
    dot output — the same undercount class that OOMed the int4 slab on its
    first hardware run (review r3); _pick_tile_int8t_slabbed already bills
    it for the transposed twin.  Prefers the measured-fastest 4096 when it
    fits (BENCH_NOTES: bf16/int8 saturate at 4096)."""
    per_row = 2 * d * itemsize + 2 * QUERY_SLAB * 4
    if n % 4096 == 0 and per_row * 4096 <= _VMEM_BUDGET:
        return 4096
    for t in _TILES:
        if n % t == 0 and per_row * t <= _VMEM_BUDGET:
            return t
    if n % _TILES[-1] == 0:
        return _TILES[-1]
    raise ValueError(f"matrix rows {n} not a multiple of {_TILES[-1]}")


def mask_scores(scores, source_ids, allowed):
    """(Q, N) scores with invalid rows (source_id -1) and filtered-out
    sources forced to -inf — the ONE home of the XLA-engine filter
    semantics (review r3: five drifting copies across the XLA scan impls
    and the int2 coarse pass).  ``allowed[0] == ALLOW_ALL`` disables the
    source filter; row validity always applies."""
    valid = source_ids >= 0
    src_ok = jnp.isin(source_ids, allowed) | (allowed[0] == ALLOW_ALL)
    return jnp.where((valid & src_ok)[None, :], scores, -jnp.inf)


def quantize_queries(q):
    """(Q, D) f32 -> ((Q, D) int8, (Q, 1) f32 scales), symmetric per query."""
    scale = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-12) / 127.0
    qi8 = jnp.clip(jnp.rint(q / scale), -127, 127).astype(jnp.int8)
    return qi8, scale


def unpack_int4_xla(packed):
    """XLA unpack of the transposed-packed (D/2, N) uint8 matrix into (D, N)
    int8 (nibble layout documented above _scan_kernel_int4: low nibble biased
    +8, high nibble two's complement).  The ONE shared decode for every
    non-Pallas engine (index/searcher.py, parallel/search.py) so a layout
    change can never fork between them."""
    p = packed.astype(jnp.int32)
    hb = p >> 4
    return jnp.concatenate(
        [(p & 15) - 8, jnp.where(hb >= 8, hb - 16, hb)], axis=0
    ).astype(jnp.int8)


def xla_scores_int8(matrix, scales, qi8, qscale):
    """(Q, N) f32 approximate scores: int8 queries x (N, D) int8 matrix,
    rescaled by per-row and per-query scales.  Shared by the jitted searcher
    engine and the shard_map local body (one copy of the scale broadcast)."""
    iscores = jax.lax.dot_general(
        qi8, matrix, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return iscores.astype(jnp.float32) * scales[None, :] * qscale


def xla_scores_int4(packed, scales, qi8, qscale):
    """(Q, N) f32 approximate scores over the transposed-packed int4 matrix
    (unpack_int4_xla layout); same sharing rationale as xla_scores_int8."""
    m2 = unpack_int4_xla(packed)
    iscores = jax.lax.dot_general(
        qi8, m2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return iscores.astype(jnp.float32) * scales[None, :] * qscale


def _in_query_chunks(jit_fn, place_key, pre_args, q, allowed, k: int, n_sweep: int):
    """THE public-wrapper body shared by all four storage tiers (review r3:
    four drifting copies): key interpret-vs-compile on where the MATRIX
    lives (``place_key``), run one jitted sweep up to MAX_QUERY_SLAB
    queries, and split bigger batches into consecutive sweeps (beyond that
    width even the slab kernels run out of VMEM)."""
    from ..utils.platform import platform_of

    interpret = platform_of(place_key) != "tpu"
    if q.shape[0] <= MAX_QUERY_SLAB:
        return jit_fn(*pre_args, q, allowed, k, interpret, n_sweep)
    outs = [
        jit_fn(*pre_args, q[s : s + MAX_QUERY_SLAB], allowed, k, interpret, n_sweep)
        for s in range(0, q.shape[0], MAX_QUERY_SLAB)
    ]
    return (
        jnp.concatenate([v for v, _ in outs], axis=0),
        jnp.concatenate([r for _, r in outs], axis=0),
    )


def _slab_pad(nq: int) -> int:
    """Zero-queries of padding that make a large batch QUERY_SLAB-aligned so
    it takes the SLABBED kernel.  Large batches must never reach the flat
    kernels: their (Q, TILE) f32 scratch + dot temporary scale with Q and
    blow scoped VMEM (measured: Q=2040 fails to compile at d=384 and 768),
    and the slab kernels are faster at that width anyway.  Padded queries
    are all-zero (quantize_queries floors their scale) and their output
    rows are sliced off by the dispatcher."""
    if nq >= 2 * QUERY_SLAB and nq % QUERY_SLAB:
        return QUERY_SLAB - nq % QUERY_SLAB
    return 0


@functools.partial(jax.jit, static_argnames=("k", "interpret", "n_sweep"))
def _scan_topk_int8(matrix, scales, source_ids, q, allowed, k: int, interpret: bool, n_sweep: int = 0):
    n = matrix.shape[0]
    nq = q.shape[0]
    pad = _slab_pad(nq)
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
    qi8, qscale = quantize_queries(q)
    if q.shape[0] >= 2 * QUERY_SLAB and q.shape[0] % QUERY_SLAB == 0:
        vals, rows = pallas_topk_int8_slabbed(
            matrix, scales.reshape(1, n), source_ids.reshape(1, n), qi8, qscale, allowed, k, interpret, n_sweep
        )
    else:
        vals, rows = pallas_topk_int8_unsorted(
            matrix, scales.reshape(1, n), source_ids.reshape(1, n), qi8, qscale, allowed, k, interpret, n_sweep
        )
    svals, perm = jax.lax.top_k(vals, k)
    return svals[:nq], jnp.take_along_axis(rows, perm, axis=1)[:nq]


def scan_topk_pallas_int8(matrix, scales, source_ids, q, allowed, k: int, n_sweep: int = 0):
    """Int8 exact-scan top-k (approximate scores; combine with f32 rerank of
    the candidate set for exact results — index.Searcher does this)."""
    return _in_query_chunks(
        _scan_topk_int8, matrix, (matrix, scales, source_ids), q, allowed, k, n_sweep
    )


# ---------------------------------------------------------------------------
# int4 packed scan: the sub-byte candidate pass (VERDICT r1 #2)
#
# The exact scan is HBM-bandwidth-bound, so bytes-per-row IS the latency.
# bf16 rows cost 2 bytes/dim; int8 1; this path packs two 4-bit dims per byte
# (0.5 bytes/dim), cutting the single-query sweep ~4x vs bf16.  Scores are
# approximate — the searcher over-fetches candidates and reranks them in f32
# from the host mirror, with over-fetch escalation bounding correctness
# (index/searcher.py _scan).
#
# Layout: the packed matrix is stored TRANSPOSED, (D/2, N) uint8, so row
# tiles are lane-major (N on the 128-wide lane axis) and the byte rows sit on
# the sublane axis (D/2 = 192 for 384-d, a multiple of the int8 sublane tile).
# Byte [r, n] holds dim r in the LOW nibble biased +8 (range [1, 15]) and dim
# r + D/2 in the HIGH nibble as two's complement (signed).  With x8 the int8
# REINTERPRETATION of the byte and lo = bitcast(byte & 15):
#
#     x8 = lo_nib + 16 * hi          (hi in [-7, 7], lo_nib in [1, 15])
#     M1 = q_lo . lo  = A + 8*sum(q_lo)     where A = q_lo . (lo_nib - 8)
#     M2 = q_hi . x8  = q_hi . lo_nib + 16*B where B = q_hi . hi
#     M3 = q_hi . lo  = q_hi . lo_nib
#     score = A + B = M1 - 8*sum(q_lo) + (M2 - M3) / 16
#
# so the only per-tile unpack work is the natively-supported uint8 `&` plus
# same-width bitcasts — Mosaic on this toolchain rejects every cheap
# alternative (uint8/int8 shifts, int8 subtract, sub-byte bitcasts), and the
# int32 round-trip unpack measured 25% slower on the marginal sweep.  The
# three half-width int8 MXU dots are free relative to the DMA.
# ---------------------------------------------------------------------------


def _scan_kernel_int4(
    allowed_ref, qlo_ref, qhi_ref, qcorr_ref, qscale_ref, m_ref, src_ref, scales_ref,
    vals_ref, rows_ref, sc_ref, *, k, tile_n, n_filter,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    p = m_ref[:]  # (d2, TILE_N) uint8
    lo = jax.lax.bitcast_convert_type(p & jnp.uint8(15), jnp.int8)
    x8 = jax.lax.bitcast_convert_type(p, jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    m1 = jax.lax.dot_general(qlo_ref[:], lo, dims, preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(qhi_ref[:], x8, dims, preferred_element_type=jnp.int32)
    m3 = jax.lax.dot_general(qhi_ref[:], lo, dims, preferred_element_type=jnp.int32)
    raw = m1.astype(jnp.float32) + (m2 - m3).astype(jnp.float32) * 0.0625 + qcorr_ref[:]
    scores = raw * scales_ref[:] * qscale_ref[:]

    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    sc_ref[:] = jnp.where(mask, scores, -jnp.inf)

    n_iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (scores.shape[0], k), 1)
    _merge_tile_topk(sc_ref, vals_ref, rows_ref, slice(None), t * tile_n, k, n_iota, k_iota)


def _pick_tile_int4(n: int, nq: int, d2: int) -> int:
    for t in _TILES:
        if n % t:
            continue
        # double-buffered packed tiles + lo/x8 unpack temporaries + scores
        vmem = 2 * d2 * t + 2 * d2 * t + nq * t * 4
        if vmem <= _VMEM_BUDGET:
            return t
    if n % _TILES[-1] == 0:
        return _TILES[-1]
    raise ValueError(f"matrix rows {n} not a multiple of {_TILES[-1]}")


def pallas_topk_int4_unsorted(packed, scales2d, src2d, qi8, qscale, allowed, k: int, interpret: bool, n_sweep: int = 0):
    """Raw int4 kernel invocation (unsorted buffer).  packed: (D/2, N) uint8
    transposed-packed (see section comment); scales2d (1, N) f32 per-row;
    qi8 (Q, D) int8 symmetric-quantized queries; qscale (Q, 1) f32.  The
    query halves and the -8*sum(q_lo) bias correction are derived here, at
    the XLA level, so the kernel sees only aligned operands."""
    d2, n = packed.shape
    n = _sweep_n(n, n_sweep)
    nq, d = qi8.shape
    tile_n = _pick_tile_int4(n, nq, d2)
    qlo, qhi = qi8[:, :d2], qi8[:, d2:]
    qcorr = (-8.0 * jnp.sum(qlo.astype(jnp.int32), axis=1, keepdims=True)).astype(jnp.float32)
    kernel = functools.partial(
        _scan_kernel_int4, k=k, tile_n=tile_n, n_filter=allowed.shape[0]
    )
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # allowed (F,)
            pl.BlockSpec((nq, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((nq, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * nq * n * d2,
            bytes_accessed=n * d2 + n * 8 + nq * d,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(allowed, qlo, qhi, qcorr, qscale, packed, src2d, scales2d)


def _scan_kernel_int4_slabbed(
    allowed_ref, qlo_ref, qhi_ref, qcorr_ref, qscale_ref, m_ref, src_ref, scales_ref,
    vals_ref, rows_ref, sc_ref, *, k, tile_n, n_filter, n_slabs,
):
    """Int4 large-batch variant: the algebraic nibble unpack (lo / x8, see
    section comment) runs ONCE per resident row tile and every 128-query
    slab's three dots reuse it — the flat kernel re-unpacks per sweep, so
    slabbing amortizes exactly the int4 tier's extra VPU work."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    p = m_ref[:]  # (d2, TILE_N) uint8
    lo = jax.lax.bitcast_convert_type(p & jnp.uint8(15), jnp.int8)
    x8 = jax.lax.bitcast_convert_type(p, jnp.int8)
    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    row_scales = scales_ref[:]
    dims = (((1,), (0,)), ((), ()))
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (QUERY_SLAB, tile_n), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (QUERY_SLAB, k), 1)

    for s in range(n_slabs):
        qsl = slice(s * QUERY_SLAB, (s + 1) * QUERY_SLAB)
        m1 = jax.lax.dot_general(qlo_ref[qsl, :], lo, dims, preferred_element_type=jnp.int32)
        m2 = jax.lax.dot_general(qhi_ref[qsl, :], x8, dims, preferred_element_type=jnp.int32)
        m3 = jax.lax.dot_general(qhi_ref[qsl, :], lo, dims, preferred_element_type=jnp.int32)
        raw = m1.astype(jnp.float32) + (m2 - m3).astype(jnp.float32) * 0.0625 + qcorr_ref[qsl, :]
        scores = raw * row_scales * qscale_ref[qsl, :]
        sc_ref[:] = jnp.where(mask, scores, -jnp.inf)
        _merge_tile_topk(sc_ref, vals_ref, rows_ref, qsl, t * tile_n, k, n_iota, k_iota)


def _pick_tile_int4_slabbed(n: int, d2: int) -> int:
    """The slab kernel's VMEM bill per tile-row is (4*d2 + 3*QUERY_SLAB*4):
    double-buffered packed tiles + the lo/x8 unpack + THREE (SLAB, TILE)
    int32 dot outputs (measured exactly: Mosaic reported 18.88M at tile
    8192 = 2304 B/row, hardware round 3) — the generic int4 fit misses the
    dot temporaries and OOMs scoped vmem at large tiles."""
    per_row = 4 * d2 + 3 * QUERY_SLAB * 4
    for t in _TILES:
        if n % t:
            continue
        if per_row * t <= _VMEM_BUDGET:
            return t
    if n % _TILES[-1] == 0:
        return _TILES[-1]
    raise ValueError(f"matrix rows {n} not a multiple of {_TILES[-1]}")


def pallas_topk_int4_slabbed(packed, scales2d, src2d, qi8, qscale, allowed, k: int, interpret: bool, n_sweep: int = 0):
    """Slabbed int4 invocation for Q a multiple of QUERY_SLAB."""
    d2, n = packed.shape
    n = _sweep_n(n, n_sweep)
    nq, d = qi8.shape
    tile_n = _pick_tile_int4_slabbed(n, d2)
    qlo, qhi = qi8[:, :d2], qi8[:, d2:]
    qcorr = (-8.0 * jnp.sum(qlo.astype(jnp.int32), axis=1, keepdims=True)).astype(jnp.float32)
    kernel = functools.partial(
        _scan_kernel_int4_slabbed, k=k, tile_n=tile_n, n_filter=allowed.shape[0],
        n_slabs=nq // QUERY_SLAB,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # allowed (F,)
            pl.BlockSpec((nq, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((QUERY_SLAB, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * nq * n * d2,
            bytes_accessed=n * d2 + n * 8 + nq * d,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(allowed, qlo, qhi, qcorr, qscale, packed, src2d, scales2d)


@functools.partial(jax.jit, static_argnames=("k", "interpret", "n_sweep"))
def _scan_topk_int4(packed, scales, source_ids, q, allowed, k: int, interpret: bool, n_sweep: int = 0):
    n = packed.shape[1]
    nq = q.shape[0]
    pad = _slab_pad(nq)
    if pad:  # large unaligned batches slab (never the flat kernel, _slab_pad)
        q = jnp.pad(q, ((0, pad), (0, 0)))
    qi8, qscale = quantize_queries(q)
    if q.shape[0] >= 2 * QUERY_SLAB and q.shape[0] % QUERY_SLAB == 0:
        vals, rows = pallas_topk_int4_slabbed(
            packed, scales.reshape(1, n), source_ids.reshape(1, n), qi8, qscale, allowed, k, interpret, n_sweep
        )
    else:
        vals, rows = pallas_topk_int4_unsorted(
            packed, scales.reshape(1, n), source_ids.reshape(1, n), qi8, qscale, allowed, k, interpret, n_sweep
        )
    svals, perm = jax.lax.top_k(vals, k)
    return svals[:nq], jnp.take_along_axis(rows, perm, axis=1)[:nq]


def scan_topk_pallas_int4(packed, scales, source_ids, q, allowed, k: int, n_sweep: int = 0):
    """Int4 packed exact-scan top-k candidates (approximate scores; the
    Searcher reranks in f32 and escalates the over-fetch)."""
    return _in_query_chunks(
        _scan_topk_int4, packed, (packed, scales, source_ids), q, allowed, k, n_sweep
    )


# ---------------------------------------------------------------------------
# transposed int8 scan ("int8t"): the int2 tier's THROUGHPUT fine companion
#
# The int2 tier stores its fine rescore matrix transposed — (depth, N), the
# column-gather-friendly layout scan_int2_coarse_fine needs (a candidate is
# one contiguous column).  With an int4 companion, batch sweeps of that
# matrix pay int4's measured structural deficit: two masked-view bitcasts +
# three half-depth dots per tile run 10.6k QPS at batch 2048 vs int8's 19k
# AT EQUAL MACs (BENCH_NOTES round-3 "the deficit is the unpack").  These
# kernels sweep a (D, N) *int8* transposed matrix with ONE full-depth dot —
# the same MXU shape as the row-major int8 kernels, so an int2 matrix whose
# HBM budget allows a 1-byte/dim companion gets int8-tier batch throughput
# AND int8-precision fine rescoring, while keeping the 2-bit single-query
# sweep.  Layout: m[d, n] = int8 level of dim d of row n; per-row scales as
# in the row-major int8 tier (matrix._quantize).
# ---------------------------------------------------------------------------


def xla_scores_int8t(m8t, scales, qi8, qscale):
    """(Q, N) f32 approximate scores over the TRANSPOSED (D, N) int8
    matrix; the non-Pallas engine twin of the kernels below."""
    iscores = jax.lax.dot_general(
        qi8, m8t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return iscores.astype(jnp.float32) * scales[None, :] * qscale


def _scan_kernel_int8t(
    allowed_ref, q_ref, qscale_ref, m_ref, src_ref, scales_ref,
    vals_ref, rows_ref, sc_ref, *, k, tile_n, n_filter,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    iscores = jax.lax.dot_general(
        q_ref[:], m_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (Q, TILE_N) int32
    scores = iscores.astype(jnp.float32) * scales_ref[:] * qscale_ref[:]

    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    sc_ref[:] = jnp.where(mask, scores, -jnp.inf)

    n_iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (scores.shape[0], k), 1)
    _merge_tile_topk(sc_ref, vals_ref, rows_ref, slice(None), t * tile_n, k, n_iota, k_iota)


def pallas_topk_int8t_unsorted(m8t, scales2d, src2d, qi8, qscale, allowed, k: int, interpret: bool, n_sweep: int = 0):
    """Raw transposed-int8 kernel invocation (unsorted buffer).  m8t:
    (D, N) int8 transposed; scales2d (1, N) f32; qi8 (Q, D) int8; qscale
    (Q, 1) f32.  The VMEM bill matches the row-major int8 kernel's
    (2 t d bytes of double-buffered tiles + the score block), so the
    shared _pick_tile fit applies."""
    d, n = m8t.shape
    n = _sweep_n(n, n_sweep)
    nq = qi8.shape[0]
    tile_n = _pick_tile(n, nq, d, 1)
    kernel = functools.partial(_scan_kernel_int8t, k=k, tile_n=tile_n, n_filter=allowed.shape[0])
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # allowed (F,)
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((nq, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d,
            bytes_accessed=n * d + n * 8 + nq * d,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(allowed, qi8, qscale, m8t, src2d, scales2d)


def _scan_kernel_int8t_slabbed(
    allowed_ref, q_ref, qscale_ref, m_ref, src_ref, scales_ref,
    vals_ref, rows_ref, sc_ref, *, k, tile_n, n_filter, n_slabs,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    m_tile = m_ref[:]  # (d, TILE_N) int8
    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    row_scales = scales_ref[:]
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (QUERY_SLAB, tile_n), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (QUERY_SLAB, k), 1)

    for s in range(n_slabs):
        qsl = slice(s * QUERY_SLAB, (s + 1) * QUERY_SLAB)
        iscores = jax.lax.dot_general(
            q_ref[qsl, :], m_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = iscores.astype(jnp.float32) * row_scales * qscale_ref[qsl, :]
        sc_ref[:] = jnp.where(mask, scores, -jnp.inf)
        _merge_tile_topk(sc_ref, vals_ref, rows_ref, qsl, t * tile_n, k, n_iota, k_iota)


def _pick_tile_int8t_slabbed(n: int, d: int) -> int:
    # double-buffered (d, tile) int8 tiles + one (SLAB, TILE) int32 dot
    # output + the (SLAB, TILE) f32 score scratch per tile-row
    per_row = 2 * d + 2 * QUERY_SLAB * 4
    for t in _TILES:
        if n % t:
            continue
        if per_row * t <= _VMEM_BUDGET:
            return t
    if n % _TILES[-1] == 0:
        return _TILES[-1]
    raise ValueError(f"matrix rows {n} not a multiple of {_TILES[-1]}")


def pallas_topk_int8t_slabbed(m8t, scales2d, src2d, qi8, qscale, allowed, k: int, interpret: bool, n_sweep: int = 0):
    """Slabbed transposed-int8 invocation for Q a multiple of QUERY_SLAB."""
    d, n = m8t.shape
    n = _sweep_n(n, n_sweep)
    nq = qi8.shape[0]
    tile_n = _pick_tile_int8t_slabbed(n, d)
    kernel = functools.partial(
        _scan_kernel_int8t_slabbed, k=k, tile_n=tile_n, n_filter=allowed.shape[0],
        n_slabs=nq // QUERY_SLAB,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # allowed (F,)
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((QUERY_SLAB, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d,
            bytes_accessed=n * d + n * 8 + nq * d,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(allowed, qi8, qscale, m8t, src2d, scales2d)


@functools.partial(jax.jit, static_argnames=("k", "interpret", "n_sweep"))
def _scan_topk_int8t(m8t, scales, source_ids, q, allowed, k: int, interpret: bool, n_sweep: int = 0):
    n = m8t.shape[1]
    nq = q.shape[0]
    pad = _slab_pad(nq)
    if pad:  # large unaligned batches slab (never the flat kernel, _slab_pad)
        q = jnp.pad(q, ((0, pad), (0, 0)))
    qi8, qscale = quantize_queries(q)
    if q.shape[0] >= 2 * QUERY_SLAB and q.shape[0] % QUERY_SLAB == 0:
        vals, rows = pallas_topk_int8t_slabbed(
            m8t, scales.reshape(1, n), source_ids.reshape(1, n), qi8, qscale, allowed, k, interpret, n_sweep
        )
    else:
        vals, rows = pallas_topk_int8t_unsorted(
            m8t, scales.reshape(1, n), source_ids.reshape(1, n), qi8, qscale, allowed, k, interpret, n_sweep
        )
    svals, perm = jax.lax.top_k(vals, k)
    return svals[:nq], jnp.take_along_axis(rows, perm, axis=1)[:nq]


def scan_topk_pallas_int8t(m8t, scales, source_ids, q, allowed, k: int, n_sweep: int = 0):
    """Transposed-int8 exact-scan top-k candidates (approximate scores; the
    Searcher reranks in f32 exactly as for the row-major int8 tier)."""
    return _in_query_chunks(
        _scan_topk_int8t, m8t, (m8t, scales, source_ids), q, allowed, k, n_sweep
    )


QUERY_SLAB = 128  # MXU-width query slabs for the large-batch kernel


def _scan_kernel_slabbed(
    allowed_ref, q_ref, m_ref, src_ref, vals_ref, rows_ref, sc_ref,
    *, k, tile_n, n_filter, n_slabs,
):
    """Large-batch variant: per grid step, iterate 128-query slabs against
    the resident row tile.  Full-width (128-row) MXU feeds and one row-tile
    DMA shared by all slabs — at Q>=256 the flat kernel is compute-bound on
    skinny matmuls and VMEM-bound into small row tiles."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    mask = _source_mask(src_ref[:], allowed_ref, n_filter)

    m_tile = m_ref[:]
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (QUERY_SLAB, tile_n), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (QUERY_SLAB, k), 1)

    for s in range(n_slabs):  # static unroll: slab slices stay tile-aligned
        qsl = slice(s * QUERY_SLAB, (s + 1) * QUERY_SLAB)
        scores = jax.lax.dot_general(
            q_ref[qsl, :], m_tile,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        sc_ref[:] = jnp.where(mask, scores, -jnp.inf)
        _merge_tile_topk(sc_ref, vals_ref, rows_ref, qsl, t * tile_n, k, n_iota, k_iota)


def pallas_topk_slabbed(matrix, src2d, qc, allowed, k: int, interpret: bool, n_sweep: int = 0):
    """Raw slabbed-kernel invocation for Q a multiple of QUERY_SLAB."""
    n, d = matrix.shape
    n = _sweep_n(n, n_sweep)
    nq = qc.shape[0]
    tile_n = _pick_tile_slabbed(n, d, matrix.dtype.itemsize)
    n_filter = allowed.shape[0]
    kernel = functools.partial(
        _scan_kernel_slabbed, k=k, tile_n=tile_n, n_filter=n_filter,
        n_slabs=nq // QUERY_SLAB,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((QUERY_SLAB, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d,
            bytes_accessed=n * d * matrix.dtype.itemsize + n * 4 + nq * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(allowed, qc, matrix, src2d)


def pallas_topk_unsorted(matrix, src2d, qc, allowed, k: int, interpret: bool, n_sweep: int = 0):
    """Raw kernel invocation: unsorted (Q,K) candidate buffer.

    Callable inside jit/shard_map (per-shard local top-k for the sharded
    searcher).  ``src2d`` is (1, N) int32; ``qc`` already in matrix dtype.
    """
    n, d = matrix.shape
    n = _sweep_n(n, n_sweep)
    nq = qc.shape[0]
    tile_n = _pick_tile(n, nq, d, matrix.dtype.itemsize)
    n_filter = allowed.shape[0]

    kernel = functools.partial(_scan_kernel, k=k, tile_n=tile_n, n_filter=n_filter)
    vals, rows = pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # allowed (F,)
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((nq, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d,
            bytes_accessed=n * d * matrix.dtype.itemsize + n * 4 + nq * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(allowed, qc, matrix, src2d)
    return vals, rows


@functools.partial(jax.jit, static_argnames=("k", "interpret", "n_sweep"))
def _scan_topk(matrix, source_ids, q, allowed, k: int, interpret: bool, n_sweep: int = 0):
    nq = q.shape[0]
    pad = _slab_pad(nq)
    if pad:  # large unaligned batches slab (never the flat kernel, _slab_pad)
        q = jnp.pad(q, ((0, pad), (0, 0)))
    qc = q.astype(matrix.dtype)
    src2d = source_ids.reshape(1, matrix.shape[0])
    if q.shape[0] >= 2 * QUERY_SLAB and q.shape[0] % QUERY_SLAB == 0:
        vals, rows = pallas_topk_slabbed(matrix, src2d, qc, allowed, k, interpret, n_sweep)
    else:
        vals, rows = pallas_topk_unsorted(matrix, src2d, qc, allowed, k, interpret, n_sweep)
    # Buffer is an unordered k-set; order it best-first (tiny (Q,K) op).
    svals, perm = jax.lax.top_k(vals, k)
    srows = jnp.take_along_axis(rows, perm, axis=1)
    return svals[:nq], srows[:nq]


# Beyond this many queries per sweep VMEM runs out even for the slabbed
# kernel; bigger batches run as consecutive sweeps
MAX_QUERY_SLAB = 2048


def scan_topk_pallas(matrix, source_ids, q, allowed, k: int, n_sweep: int = 0):
    """Exact top-k of ``q @ matrix.T`` with row validity/source filtering.

    matrix: (N, D) storage dtype (bf16/f32), N a multiple of 512.
    source_ids: (N,) int32, -1 = invalid row.
    q: (Q, D) float32 queries (cast to the matrix dtype for the MXU); any Q
    (split into consecutive sweeps of MAX_QUERY_SLAB past that width).
    allowed: (F,) int32 source filter; allowed[0] == ALLOW_ALL disables.
    Returns ((Q, k) f32 scores best-first, (Q, k) int32 row indices);
    slots past the number of matching rows carry -inf / -1.
    """
    return _in_query_chunks(
        _scan_topk, matrix, (matrix, source_ids), q, allowed, k, n_sweep
    )


# ---------------------------------------------------------------------------
# int2 coarse pass: the quarter-byte latency tier (round 3)
#
# The single-query sweep is HBM-bandwidth-bound, so 0.25 bytes/dim halves
# the int4 tier's read again.  2-bit scores are too noisy to hand the
# candidate set straight to the 128-deep f32 rerank (dot-noise std ~3x
# int4's), so the tier is COARSE-TO-FINE inside one compiled program:
#
#     pallas scores-only int2 scan  ->  (Q, N) f32 scores in HBM
#     EXACT hierarchical top-k      ->  INT2_COARSE_FETCH candidates
#       (_select_topk_hier: window-max pool + two small top_k calls)
#     gather int4 columns + int8 dot rerank -> top-k candidates
#
# and the Searcher's existing f32-mirror rerank + escalation runs on those
# exactly as for the int4 tier (an escalation falls back to a FULL int4
# sweep of the fine matrix, restoring that tier's guarantee verbatim).
# There is no in-kernel top-k merge: writing all N scores costs ~4% of the
# packed-matrix read, which is what permits a 4096-deep coarse fetch (the
# in-kernel merge buffer is VMEM-bound at ~1k and measured 5x slower,
# probe_int2d).  Round 3 rejected approx_max_k because the coarse floor's
# escalation bound wants the EXACT kc-th coarse score; round 4 reversed
# that: the int2 floor was already statistical (no hard noise bound), the
# coarse self-audit measures END recall of the production pipeline on the
# actual corpus, and the PartialReduce select is ~0.9 ms faster
# (select="approx", probe_int2_approx).
#
# Layout ((D/4, N) uint8 transposed like int4, all Mosaic-legal ops —
# uint8 `&` + same-width bitcasts only):
#   byte[r, n] packs dims r, r+D/4, r+2D/4, r+3D/4 as 2-bit crumbs.
#   Every dim quantizes to the uniform symmetric 4-level grid
#   {-3,-1,1,3} * s_row (s_row = max(rms/2, eps): the MSE-optimal uniform
#   scale for gaussian-ish dims, measured MSE 0.119*var).
#   Planes 0-2 store crumb c in {0..3}, level = 2c-3:
#       bitcast(b & 0x03, i8) = c0
#       bitcast(b & 0x0C, i8) = 4*c1
#       bitcast(b & 0x30, i8) = 16*c2
#   Plane 3 stores t = (level-1)/2 in {-2..1} TWO'S COMPLEMENT in the top
#   crumb so the masked byte reinterprets as int8 directly:
#       bitcast(b & 0xC0, i8) = 64*t3        (level = 2t+1)
#   With four quarter-width int8 MXU dots M0..M3 of the query slices
#   against those masked views:
#       sum_d q_d*level_d = 2*M0 + M1/2 + M2/8 + M3/32
#                           - 3*(sum q0+q1+q2) + sum q3
#   score = that * s_row * qscale.  Exactness of the algebra is tested
#   against a numpy crumb decode (tests/test_int2.py).
# ---------------------------------------------------------------------------

# Coarse candidate depth.  At 10M gaussian rows the measured/modelled 2-bit
# dot-noise (std 0.0176 for unit rows) puts the oracle top-10 inside the
# coarse top-4096 with ~1e-4 per-item miss probability; the int4 fine pass
# then reduces 4096 -> k at int4 noise (the tier whose 10M candidate
# recall measured 0.999805 at 128).  Escalation covers the tail.
INT2_COARSE_FETCH = 4096

# recall_target of the PartialReduce selection (select="approx"): steers
# the TPU ApproxTopK reduction-buffer size (~40k bins at 0.90, ~157k at
# 0.95 for 10M inputs).  A true-top-10 row at coarse rank R is dropped
# with probability ~(R-1)/bins (bin collision with a higher score), so
# the buffer must dwarf the int2 noise-displacement tail of true-top-10
# coarse ranks — 0.95 measured recall-clean at 10M (see BENCH_NOTES
# round-4); 0.90's 40k bins measurably graze the tail.  Baked at import:
# the jit cache keys on the select name only.
# recall_target of the PartialReduce select.  Round 5 default 0.98 -> 0.95:
# the aggregation buffer (~3.1k/(1-rt)) halves (313k -> 157k), its sort is
# the dominant select cost (probe_r5_glue), and rt .95's candidate misses
# measured IDENTICAL to .98 on the 10M gaussian corpus twice
# (candidate-recall@10 0.999219 both, same miss set: a within-32-rows bin
# collision collides at both widths — BENCH_NOTES round-4).  rt=0.90
# measured 0.998047 (FAILS the 0.999 bar) and is not a valid default.
_INT2_APPROX_RT = float(os.environ.get("PERCEIVE_TPU_INT2_APPROX_RT", "0.95"))

# Address-order the approx branch's candidate gather (argsort + two
# take_along_axis) before the fine phase.  Round-3 isolated measurement
# favored ordering (0.14 vs 0.52 ms); round-5 composed A/B measured the
# ordering COSTING ~0.12 ms at 10M (probe_r5_glue: prod 2.046 / nosort
# 1.929).  Default off for the approx branch; the exact branches keep it.
_INT2_ADDR_ORDER = os.environ.get("PERCEIVE_TPU_INT2_ADDR_ORDER", "0") == "1"

# Extra candidate slots past the coarse depth for the sort-free threshold
# selection (select="threshold"): absorbs score-tie classes straddling the
# kc-th window max so the common path stays sort-free.  A tie class wider
# than the slack lax.cond-falls back to the exact blocks top-k at kcap
# depth (floor = the kcap-th block score) — see _select_threshold.
_INT2_CAP_SLACK = 1024


def unpack_int2_xla(packed):
    """XLA decode of the transposed-packed (D/4, N) uint8 matrix into
    (D, N) int8 LEVELS in {-3,-1,1,3} (layout above).  The ONE shared
    decode for every non-Pallas engine, mirroring unpack_int4_xla."""
    p = packed.astype(jnp.int32)
    c0 = p & 3
    c1 = (p >> 2) & 3
    c2 = (p >> 4) & 3
    t3 = p >> 6
    t3 = jnp.where(t3 >= 2, t3 - 4, t3)
    return jnp.concatenate(
        [2 * c0 - 3, 2 * c1 - 3, 2 * c2 - 3, 2 * t3 + 1], axis=0
    ).astype(jnp.int8)


def xla_scores_int2(packed, scales, qi8, qscale):
    """(Q, N) f32 approximate coarse scores (XLA engine / CPU tests)."""
    m2 = unpack_int2_xla(packed)
    iscores = jax.lax.dot_general(
        qi8, m2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return iscores.astype(jnp.float32) * scales[None, :] * qscale


def _int2_query_parts(qi8, d4):
    """Query plane slices + the per-query bias correction (f32)."""
    q0, q1, q2, q3 = (qi8[:, i * d4 : (i + 1) * d4] for i in range(4))
    s012 = jnp.sum(qi8[:, : 3 * d4].astype(jnp.int32), axis=1, keepdims=True)
    s3 = jnp.sum(q3.astype(jnp.int32), axis=1, keepdims=True)
    qcorr = (-3.0 * s012 + 1.0 * s3).astype(jnp.float32)
    return q0, q1, q2, q3, qcorr


def _scan_kernel_int2_scores(
    allowed_ref, q0_ref, q1_ref, q2_ref, q3_ref, qcorr_ref, qscale_ref,
    m_ref, src_ref, scales_ref, out_ref, *, n_filter,
):
    p = m_ref[:]  # (d4, TILE_N) uint8
    b0 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x03), jnp.int8)
    b1 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x0C), jnp.int8)
    b2 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x30), jnp.int8)
    b3 = jax.lax.bitcast_convert_type(p & jnp.uint8(0xC0), jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    m0 = jax.lax.dot_general(q0_ref[:], b0, dims, preferred_element_type=jnp.int32)
    m1 = jax.lax.dot_general(q1_ref[:], b1, dims, preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(q2_ref[:], b2, dims, preferred_element_type=jnp.int32)
    m3 = jax.lax.dot_general(q3_ref[:], b3, dims, preferred_element_type=jnp.int32)
    raw = (
        2.0 * m0.astype(jnp.float32)
        + 0.5 * m1.astype(jnp.float32)
        + 0.125 * m2.astype(jnp.float32)
        + 0.03125 * m3.astype(jnp.float32)
        + qcorr_ref[:]
    )
    scores = raw * scales_ref[:] * qscale_ref[:]
    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    out_ref[:] = jnp.where(mask, scores, -jnp.inf)


# The scores-only kernel is pure streaming (no in-kernel top-k state), so
# it profits from fatter tiles than the merge kernels: 12288 measured
# 672 GB/s of packed bytes vs 518 at 8192 (probe_int2 round 2, confirmed
# in composition by probe_int2o: full pipeline 2.13 ms @12288 vs 2.46
# @8192).  12288 = 24*512 keeps the ROW_ALIGN invariant.
_TILES_INT2 = (12288,) + _TILES


def _pick_tile_int2(n: int, nq: int, d4: int) -> int:
    # double-buffered packed tiles + 4 masked int8 views + the score block
    for t in _TILES_INT2:
        if n % t:
            continue
        if 2 * d4 * t + 4 * d4 * t + nq * t * 4 <= _VMEM_BUDGET:
            return t
    if n % _TILES[-1] == 0:
        return _TILES[-1]
    raise ValueError(f"matrix rows {n} not a multiple of {_TILES[-1]}")


def pallas_int2_scores(packed, scales2d, src2d, qi8, qscale, allowed, interpret, n_sweep: int = 0):
    """Masked coarse scores, (Q, n_sweep or N) f32 in HBM (no in-kernel
    selection — see section comment).  packed: (D/4, N) uint8; qi8 (Q, D)
    int8."""
    d4, n = packed.shape
    n = _sweep_n(n, n_sweep)
    nq = qi8.shape[0]
    tile_n = _pick_tile_int2(n, nq, d4)
    q0, q1, q2, q3, qcorr = _int2_query_parts(qi8, d4)
    kernel = functools.partial(_scan_kernel_int2_scores, n_filter=allowed.shape[0])
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # allowed (F,)
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d4, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * nq * n * d4,
            bytes_accessed=n * d4 + n * 8 + nq * n * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(allowed, q0, q1, q2, q3, qcorr, qscale, packed, src2d, scales2d)


# Per-tile candidate width of the "tiletop" epilogue selection: the score
# kernel bins each tile into 128 stride-128 lane-bins (PartialReduce's
# binning) and keeps the top-(M/128) of every bin via sublane
# max/argmax passes while the scores are still in VMEM — the (Q, N)
# score buffer never touches HBM and no separate selection pass re-reads
# it.  A row at global coarse rank R is dropped iff >= M/128 better rows
# share its width-w bin (w = tile/128, 96 at the streaming tile): with
# depth 2, P(drop) ~ (R*w/N)^2/2 — at 10M that is ~8e-4 for the
# kc=4096-th candidate and ~1e-6 at the rank-150 displacement mean,
# an order gentler than PartialReduce's depth-1 binning at equal buffer.
_INT2_TILETOP_M = 256  # 2 x 128 lanes per tile
# Depth cap: each extra 128 lanes costs one more sublane reduction pass
# over the tile; corpora needing more depth (few tiles relative to kc)
# are better served by the approx/exact selects.
_INT2_TILETOP_MAX = 512


def _tiletop_depth(n: int, tile_n: int, kc: int) -> int:
    """Per-tile output width (a multiple of 128) for a kc-deep fetch: at
    least the depth-2 recall floor and enough that the reduced buffer
    holds >= 2*kc candidates.  Raises when the corpus has too few tiles
    for that within the epilogue budget — callers (the audit's variant
    pick) must check tiletop_viable first."""
    t = max(n // tile_n, 1)
    need = -(-2 * kc // t)  # ceil: buffer >= 2*kc
    m = max(_INT2_TILETOP_M, 128 * -(-need // 128))
    if m > _INT2_TILETOP_MAX:
        raise ValueError(
            f"tiletop select needs {m}-wide tiles at n={n}, kc={kc} "
            f"(tile {tile_n}) — beyond the epilogue budget "
            f"{_INT2_TILETOP_MAX}; use select='approx' or 'exact'"
        )
    return m


def tiletop_viable(n: int, nq: int, d4: int, kc: int) -> bool:
    """True when the epilogue-fused selection is applicable at this
    geometry (enough tiles that the per-tile depth stays in budget)."""
    if kc >= n:
        return False
    try:
        _tiletop_depth(n, _pick_tile_int2(n, nq, d4), kc)
    except ValueError:
        return False
    return True


def _scan_kernel_int2_tiletop(
    allowed_ref, q0_ref, q1_ref, q2_ref, q3_ref, qcorr_ref, qscale_ref,
    m_ref, src_ref, scales_ref, vals_ref, rows_ref, *, n_filter, m_top, tile_n,
):
    """The scores kernel (_scan_kernel_int2_scores) + an in-VMEM top-M
    epilogue per tile: M unrolled max/argmax extractions with index
    masking (ties survive — masking is by LANE, not by value)."""
    p = m_ref[:]  # (d4, TILE_N) uint8
    b0 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x03), jnp.int8)
    b1 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x0C), jnp.int8)
    b2 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x30), jnp.int8)
    b3 = jax.lax.bitcast_convert_type(p & jnp.uint8(0xC0), jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    m0 = jax.lax.dot_general(q0_ref[:], b0, dims, preferred_element_type=jnp.int32)
    m1 = jax.lax.dot_general(q1_ref[:], b1, dims, preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(q2_ref[:], b2, dims, preferred_element_type=jnp.int32)
    m3 = jax.lax.dot_general(q3_ref[:], b3, dims, preferred_element_type=jnp.int32)
    raw = (
        2.0 * m0.astype(jnp.float32)
        + 0.5 * m1.astype(jnp.float32)
        + 0.125 * m2.astype(jnp.float32)
        + 0.03125 * m3.astype(jnp.float32)
        + qcorr_ref[:]
    )
    scores = raw * scales_ref[:] * qscale_ref[:]
    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    cur = jnp.where(mask, scores, -jnp.inf)  # (nq, tile_n)
    base = pl.program_id(0) * tile_n
    nq = cur.shape[0]
    # per-(lane)-bin top-p via SUBLANE reductions: reshape the tile to
    # (nq, sub, 128) — bin l = stride-128 positions {s*128 + l}, exactly
    # PartialReduce's binning but depth p instead of 1, and computed while
    # the scores are still in VMEM.  p max/argmax passes over the sublane
    # axis are cheap vector reductions (the serial full-width extract this
    # replaces measured 5.7 ms vs approx's 2.1 at 10M — probe_int2_tiletop
    # round 1).
    sub = cur.shape[1] // 128
    resh = cur.reshape(nq, sub, 128)
    sl_iota = jax.lax.broadcasted_iota(jnp.int32, resh.shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nq, 128), 1)
    vs, ps = [], []
    for _ in range(m_top // 128):
        v = jnp.max(resh, axis=1)  # (nq, 128)
        a = jnp.argmax(resh, axis=1).astype(jnp.int32)  # (nq, 128)
        vs.append(v)
        ps.append(base + a * 128 + lane)
        resh = jnp.where(sl_iota == a[:, None, :], -jnp.inf, resh)
    vals_ref[:] = jnp.concatenate(vs, axis=1)
    rows_ref[:] = jnp.concatenate(ps, axis=1)


def pallas_int2_scores_tiletop(
    packed, scales2d, src2d, qi8, qscale, allowed, interpret,
    n_sweep: int = 0, kc: int = 0, m_top: int = 0,
):
    """Fused score + per-tile top-M selection: ((Q, T*M) f32 vals,
    (Q, T*M) int32 global rows), T = n/tile, M from _tiletop_depth(kc)
    unless pinned by ``m_top``.  Dropped rows (see _INT2_TILETOP_M) make
    the downstream floor statistical-only, like the approx select; the
    searcher's audit measures the end recall."""
    d4, n = packed.shape
    n = _sweep_n(n, n_sweep)
    nq = qi8.shape[0]
    tile_n = _pick_tile_int2(n, nq, d4)
    if not m_top:
        m_top = _tiletop_depth(n, tile_n, kc or 1)
    q0, q1, q2, q3, qcorr = _int2_query_parts(qi8, d4)
    kernel = functools.partial(
        _scan_kernel_int2_tiletop, n_filter=allowed.shape[0], m_top=m_top,
        tile_n=tile_n,
    )
    out_v, out_r = pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # allowed (F,)
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d4, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nq, m_top), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, m_top), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, (n // tile_n) * m_top), jnp.float32),
            jax.ShapeDtypeStruct((nq, (n // tile_n) * m_top), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * nq * n * d4 + (m_top // 128) * nq * n,
            bytes_accessed=n * d4 + n * 8 + nq * (n // tile_n) * m_top * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(allowed, q0, q1, q2, q3, qcorr, qscale, packed, src2d, scales2d)
    return out_v, out_r


# Window width of the hierarchical coarse selection (lane width: the
# window max is one cheap reduce over the score row).
_INT2_WINDOW = 128


def _select_topk_hier(scores_row, k: int):
    """EXACT top-k of a (N,) f32 score row via window-max pooling — the
    full-array lax.top_k costs ~25 ms at 10M on the bench chip (a sort),
    while this costs one bandwidth-bound window reduce + two small top_k
    calls (~0.2 ms measured, probe_int2e):

        window-128 maxes -> top-k windows -> gather those windows' score
        blocks (contiguous 512 B each) -> top-k of the k*128 gathered.

    Exact because a row with global rank R has at most R-1 rows above it,
    hence at most R-1 windows with a higher max: every rank<=k row's
    window survives the window-level top-k, so the gathered set contains
    the entire true top-k.  Requires n % 128 == 0 (matrix capacity is
    512-aligned) and n//128 >= k (the caller falls back to lax.top_k
    below that)."""
    n = scores_row.shape[0]
    nw = n // _INT2_WINDOW
    wmax = jnp.max(scores_row.reshape(nw, _INT2_WINDOW), axis=1)
    _, widx = jax.lax.top_k(wmax, k)
    blocks = jnp.take(scores_row.reshape(nw, _INT2_WINDOW), widx, axis=0)
    gidx = (
        widx[:, None] * _INT2_WINDOW + jnp.arange(_INT2_WINDOW)[None, :]
    ).reshape(-1)
    v, p = jax.lax.top_k(blocks.reshape(-1), k)
    return v, jnp.take(gidx, p)


def _select_window_fine(
    coarse_row, packed4, scales4, qi8_row, qscale_row, kc: int, kf: int,
    fine_bits: int,
):
    """Window-cut selection + fine rescore for ONE query (the round-3
    alternative to exact-top-kc selection; see scan_int2_coarse_fine).

    Takes the top ``kc`` 128-wide WINDOWS by window max and fine-rescores
    every row in them (kc*128 rows) instead of exact-selecting the top kc
    coarse rows and rescoring only those.  The candidate set is a STRICT
    SUPERSET of the exact path's: the kc-th window max is the score of some
    row, and distinct windows' maxes are distinct rows, so it is <= the
    kc-th coarse row score — every row above it lives in a selected window.
    Hence recall >= the exact path's at equal kc, and the returned floor
    (the kc-th window max) remains a sound upper bound on every EXCLUDED
    row: rows outside selected windows are <= their window max <= floor.
    What this buys: the exact path's dominant cost is the final
    lax.top_k over kc*128 gathered block scores (a big-k sort); here
    selection is one top_k over N/128 window maxes, and the fine phase is a
    streaming block gather + int8 matmul (bandwidth, not sort).

    Returns ((kf,) fine scores best-first, (kf,) int32 global rows,
    () f32 floor)."""
    n = coarse_row.shape[0]
    nw = n // _INT2_WINDOW
    sc_w = coarse_row.reshape(nw, _INT2_WINDOW)
    wmax = jnp.max(sc_w, axis=1)
    wv, widx = jax.lax.top_k(wmax, kc)
    floor = jnp.where(kc >= nw, -jnp.inf, wv[-1])
    # ascending window addresses coalesce the block gathers (probe_int2g)
    widx = jnp.sort(widx)
    nw_full = packed4.shape[1] // _INT2_WINDOW  # capacity may exceed the sweep
    cblk = jnp.take(sc_w, widx, axis=0).reshape(-1)  # (kc*128,) mask source
    sblk = jnp.take(
        scales4.reshape(nw_full, _INT2_WINDOW), widx, axis=0
    ).reshape(-1)
    d_rows = packed4.shape[0]
    blk = jnp.take(
        packed4.reshape(d_rows, nw_full, _INT2_WINDOW), widx, axis=1
    ).reshape(d_rows, kc * _INT2_WINDOW)
    lv = blk if fine_bits == 8 else unpack_int4_xla(blk)
    isc = jax.lax.dot_general(
        qi8_row[None, :], lv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )[0]
    fine = isc.astype(jnp.float32) * sblk * qscale_row
    # invalid rows carry -inf coarse scores; garbage fine bytes must not
    # resurface them
    fine = jnp.where(jnp.isfinite(cblk), fine, -jnp.inf)
    v, p = _select_topk_hier(fine, kf)
    gidx = (
        widx[:, None] * _INT2_WINDOW + jnp.arange(_INT2_WINDOW)[None, :]
    ).reshape(-1)
    return v, jnp.take(gidx, p), floor


def _compact_ge(vals2d, theta, cap: int):
    """Compact the entries of ``vals2d`` (B, W) with value >= theta into
    ``cap`` output slots, ordered by (block asc, lane asc) — i.e. by
    ascending address when blocks are address-ordered — WITHOUT any
    global sort: per-block lane counts + cumsum offsets, a per-block
    W-wide lane sort (masked lanes first), and a searchsorted over the
    offsets to map output slots back to (block, lane).

    Returns (vals (cap,), block (cap,), lane (cap,), valid (cap,) bool,
    total_count).  Slots past the true count are invalid (clamped
    addresses, caller masks).  If total_count > cap the tail is silently
    dropped — the caller must raise its floor (overflow)."""
    nb, w = vals2d.shape
    mask = vals2d >= theta
    c_b = jnp.sum(mask.astype(jnp.int32), axis=1)
    off = jnp.cumsum(c_b)  # inclusive; block b owns slots [off[b]-c_b[b], off[b])
    total = off[-1]
    lanes = jnp.arange(w, dtype=jnp.int32)[None, :]
    key = jnp.where(mask, lanes, w + lanes)
    slane = jnp.sort(key, axis=1)  # masked lanes first, each side ascending
    i = jnp.arange(cap, dtype=jnp.int32)
    b_i = jnp.searchsorted(off, i, side="right").astype(jnp.int32)
    b_c = jnp.minimum(b_i, nb - 1)
    start = off[b_c] - c_b[b_c]
    r_c = jnp.clip(i - start, 0, w - 1)
    lane = slane[b_c, r_c]
    valid = (i < total) & (lane < w)
    lane_c = jnp.minimum(lane, w - 1)
    return vals2d[b_c, lane_c], b_c, lane_c, valid, total


def _select_threshold(coarse_row, kc: int, kcap: int):
    """Selection for ONE query's coarse scores without the kc*128-element
    big-k sort (probe_int2_sortcost bounded that sort at ~0.48 ms of the
    2.55 ms pipeline; the window-cut gather alternative and a full
    bisection rewrite both measured SLOWER — probe_int2_wincut).

    The kc-th WINDOW max (free out of the existing exact window top_k) is
    itself a valid threshold: theta0 = wv[kc-1] <= the kc-th coarse row
    score s_kc (distinct windows' maxes are distinct rows), and every true
    top-kc row lives in a selected window (a row with global rank R has at
    most R-1 windows above its window max).  So candidates := gathered
    block entries >= theta0 CONTAIN the exact top-kc whenever they fit the
    kcap slots, and floor = theta0 soundly bounds every excluded row
    (out-of-window rows <= theta0 by window-max ordering, in-window
    leftovers < theta0 by construction).  count(>= theta0) is typically
    kc + a few hundred (it equals the global rank of the kc-th window max);
    a tie/cluster pileup past kcap falls back — via lax.cond, so the big
    sort never runs on the common path — to the exact blocks top-k with
    floor = the kcap-th block score (also sound: sort keeps the kcap
    largest, so excluded entries are bounded by the last kept).

    Returns ((kcap,) coarse vals, (kcap,) int32 rows ascending in the
    compact path, floor).  Invalid slots carry -inf vals / row 0."""
    n = coarse_row.shape[0]
    nw = n // _INT2_WINDOW
    sc_w = coarse_row.reshape(nw, _INT2_WINDOW)
    wmax = jnp.max(sc_w, axis=1)
    wv, widx = jax.lax.top_k(wmax, kc)
    theta = wv[kc - 1]
    widx = jnp.sort(widx)  # ascending window addresses coalesce the gather
    blocks = jnp.take(sc_w, widx, axis=0)  # (kc, 128)
    cnt = jnp.sum((blocks >= theta).astype(jnp.int32))
    gidx = (
        widx[:, None] * _INT2_WINDOW + jnp.arange(_INT2_WINDOW)[None, :]
    ).reshape(-1)

    def compact_path(_):
        v, bb, lane, valid, _ = _compact_ge(blocks, theta, kcap)
        cv = jnp.where(valid, v, -jnp.inf)
        rows = jnp.where(valid, widx[bb] * _INT2_WINDOW + lane, 0)
        return cv, rows, theta

    def sort_path(_):
        cv, p = jax.lax.top_k(blocks.reshape(-1), kcap)
        rows = jnp.take(gidx, p)
        fl = cv[kcap - 1]
        order = jnp.argsort(rows)  # address-order the fine gather
        return jnp.take(cv, order), jnp.take(rows, order), fl

    cvals, rows, floor = jax.lax.cond(cnt <= kcap, compact_path, sort_path, None)
    return cvals, rows, floor


def int2_coarse_depth(k: int, n: int, fetch: int = 0) -> int:
    """Coarse candidate depth for a fine fetch of ``k``.  ``fetch`` (0 =
    the INT2_COARSE_FETCH default) is the audit-chosen adaptive depth
    (VERDICT r3 #2: where the measured displacement of reference rows
    shows wide margins, a shallower fetch cuts the selection + fine-phase
    cost; searcher.audit_coarse bounds it by the displacement tail).
    Clamped to the corpus; escalations that need to see past the coarse
    floor do NOT deepen this pass — the searcher falls back to a full
    fine-companion sweep instead (searcher._scan), whose cost is bounded
    and whose floor semantics are the proven fine-tier ones.  (Scaling
    the depth here would blow up the hierarchical selection's final
    top_k, which is O(depth*128) sorted.)"""
    return min(max(fetch or INT2_COARSE_FETCH, 2 * k), n)


def scan_int2_coarse_fine(
    packed2, scales2, packed4, scales4, source_ids, q, allowed, k: int,
    *, k_coarse: int = 0, engine: str = "pallas", interpret: bool = False,
    n_sweep: int = 0, fine_bits: int = 4, select: str = "auto",
    fetch: int = 0,
):
    """Traceable coarse-to-fine int2 scan (see section comment).

    ``packed4`` is the TRANSPOSED fine companion: with ``fine_bits=4`` a
    (D/2, N) packed-int4 matrix byte-identical to the int4 tier's, with
    ``fine_bits=8`` a (D, N) int8 matrix (the throughput companion — see
    the int8t section; batch sweeps of it run int8-class QPS instead of
    paying int4's unpack deficit).  Either way batched queries and
    escalation sweeps run the matching kernels on it directly, and the
    per-query candidate gather of k_coarse columns measured ~0.07 ms
    (probe_int2c; a row-major layout's unaligned rows gathered ~200x
    slower).  Returns ((Q, k) f32 fine scores best-first, (Q, k)
    int32 rows, (Q,) f32 coarse floor — an upper bound on every row
    OUTSIDE the candidate set (select="exact": the k_coarse-th int2
    score; "window": the k_coarse-th window max; "threshold": the
    window-max threshold, or the kcap-th block score on tie overflow;
    "approx": the k_coarse-th RETURNED score — statistical only, bin-
    collision misses can exceed it); -inf when the whole corpus was
    fetched).

    ``select`` picks the candidate-selection variant: "approx" (default —
    TPU PartialReduce, fastest measured), "exact", "window", "threshold";
    see the variant docstrings, BENCH_NOTES round-3 "selection-sort
    alley" and round-4 "PartialReduce selection".
    """
    n_full = packed2.shape[1]
    n = _sweep_n(n_full, n_sweep)
    if not k_coarse:
        k_coarse = int2_coarse_depth(k, n, fetch)
    qi8, qscale = quantize_queries(q)
    kc = min(k_coarse, n)
    nq = q.shape[0]
    kf = min(k, kc)
    if select == "tiletop":
        if engine != "pallas":
            raise ValueError("select='tiletop' requires the pallas engine")
        if kc >= n:
            # full fetch: nothing to select away — the exact path's plain
            # top_k over full scores is the same result with a -inf floor
            select = "exact"
    if select != "tiletop":
        if engine == "pallas":
            coarse = pallas_int2_scores(
                packed2, scales2.reshape(1, n_full), source_ids.reshape(1, n_full),
                qi8, qscale, allowed, interpret, n,
            )
        else:
            coarse = mask_scores(
                xla_scores_int2(packed2[:, :n], scales2[:n], qi8, qscale),
                source_ids[:n], allowed,
            )
    if select == "auto":
        # round-4: "approx" (TPU PartialReduce) replaces "exact" as the
        # default — full pipeline 1.96 vs 2.53-2.72 ms at 10M
        # (probe_int2_approx/3), candidate-recall@10 holds the >=0.999
        # tier bar at recall_target 0.98 (BENCH_NOTES round-4; rt 0.95
        # measured 0.99922, the doubled 0.98 buffer costs nothing).  The
        # round-3 sort-free extractions all lost because they re-derived
        # an EXACT candidate set without the sort; PartialReduce drops
        # exactness the tier never truly had (the int2 floor was already
        # statistical) and keeps the one-pass structure.  "exact" remains
        # selectable for harnesses and for parts without the custom call.
        select = "approx"
    if select not in ("exact", "approx", "window", "threshold", "tiletop"):
        # silent fallback would let a typo'd variant A/B exact vs exact and
        # record a bogus ~0 ms paired diff as a measurement
        raise ValueError(f"unknown select {select!r}")
    if select in ("window", "threshold") and not (
        n % _INT2_WINDOW == 0 and n // _INT2_WINDOW >= kc
    ):
        # same trap as the typo case: an explicitly-requested variant that
        # silently fell back to the exact path would A/B exact-vs-exact and
        # return exact-path floor semantics under the variant's name
        # (review r3).  Only "auto"/"exact" may take the generic path.
        raise ValueError(
            f"select {select!r} requires n % {_INT2_WINDOW} == 0 and "
            f"n // {_INT2_WINDOW} >= k_coarse (n={n}, k_coarse={kc})"
        )
    if (
        select == "window"
        and n % _INT2_WINDOW == 0
        and n // _INT2_WINDOW >= kc
    ):
        # window-cut: candidates = every row of the top-kc windows (strict
        # recall superset of the exact path at equal kc — see
        # _select_window_fine); floor = the kc-th window max.  Unrolled per
        # query like the exact select below (Q <= 8 by routing).
        outs = [
            _select_window_fine(
                coarse[i], packed4, scales4, qi8[i], qscale[i, 0], kc, kf,
                fine_bits,
            )
            for i in range(nq)
        ]
        vals = jnp.stack([v for v, _, _ in outs])
        rows = jnp.stack([r for _, r, _ in outs])
        floor = jnp.stack([f for _, _, f in outs])
        rows = jnp.where(jnp.isfinite(vals), rows, -1)
        if kf < k:  # tiny corpus: pad to the requested k like the others
            pad_v = jnp.full((nq, k - kf), -jnp.inf, vals.dtype)
            pad_r = jnp.full((nq, k - kf), -1, rows.dtype)
            vals = jnp.concatenate([vals, pad_v], axis=1)
            rows = jnp.concatenate([rows, pad_r], axis=1)
        return vals, rows, floor
    if select == "tiletop":
        # epilogue-fused selection: the score kernel itself kept the
        # per-tile top-M (pallas_int2_scores_tiletop) — the (Q, N) score
        # buffer never reached HBM; finish with an exact top-kc over the
        # ~N·M/tile-sized candidate buffer.  Floor semantics match the
        # approx select (statistical: a row dropped in-tile can exceed
        # the kc-th kept value); the self-audit measures the end recall
        # of this pipeline on the actual corpus like every variant.
        tvals, trows = pallas_int2_scores_tiletop(
            packed2, scales2.reshape(1, n_full), source_ids.reshape(1, n_full),
            qi8, qscale, allowed, interpret, n, kc=kc,
        )
        kcap = min(kc, tvals.shape[1])
        cvals, perm = jax.lax.top_k(tvals, kcap)
        idx = jnp.take_along_axis(trows, perm, axis=1)
        floor = cvals[:, -1]
        # address-order the fine gather exactly like the generic path
        order = jnp.argsort(idx, axis=1)
        idx = jnp.take_along_axis(idx, order, axis=1)
        cvals = jnp.take_along_axis(cvals, order, axis=1)
    elif (
        select == "threshold"
        and n % _INT2_WINDOW == 0
        and n // _INT2_WINDOW >= kc
    ):
        # sort-free selection: the kc-th window max as the threshold +
        # per-block compaction (_select_threshold) — candidates come back
        # address-ASCENDING, so the exact path's argsort is unnecessary.
        # Depth is kcap (kc plus tie slack); invalid slots carry -inf cvals
        # like the exact path.
        kcap = min(kc + _INT2_CAP_SLACK, kc * _INT2_WINDOW)
        outs = [_select_threshold(coarse[i], kc, kcap) for i in range(nq)]
        cvals = jnp.stack([v for v, _, _ in outs])
        idx = jnp.stack([r for _, r, _ in outs])
        floor = jnp.stack([f for _, _, f in outs])
    else:
        if select == "approx" and kc < n:
            # PartialReduce (TPU ApproxTopK custom call): ONE bandwidth-
            # bound pass replaces the two-top_k hierarchical select —
            # measured 1.6-2.0 ms full-pipeline vs 2.5-2.6 exact at 10M
            # (probe_int2_approx, BENCH_NOTES round-4).  The candidate SET
            # is approximate: a bin collision drops a row with probability
            # ~rank/bins (see _INT2_APPROX_RT), so the floor below is
            # statistical-only — unfetched rows CAN exceed it.  The tier
            # already leans on statistical floors for int2 noise, the f32
            # rerank fixes ordering, and the coarse self-audit measures
            # the end recall of THIS pipeline on the actual corpus (the
            # audit runs production scans, so approx selection is audited
            # too).  Unrolled per query like the exact select (Q <= 8).
            # On CPU (tests) approx_max_k lowers to an exact top-k.
            outs = [
                jax.lax.approx_max_k(coarse[i], kc, recall_target=_INT2_APPROX_RT)
                for i in range(nq)
            ]
            cvals = jnp.stack([v for v, _ in outs])
            idx = jnp.stack([p for _, p in outs])
            if not _INT2_ADDR_ORDER:
                # round-5 (probe_r5_glue): composed A/B measured the
                # argsort address-ordering COSTING ~0.12 ms here (prod
                # 2.046 vs nosort 1.929 ms at 10M) — the 4096-argsort +
                # two take_along_axis outweigh the coalesced-gather win
                # for the approx branch's value-sorted output.  cvals are
                # already best-first, so the floor below is unchanged and
                # the fine top_k re-sorts regardless.  The exact branch
                # keeps ordering (its r3 isolated measurement favored it);
                # PERCEIVE_TPU_INT2_ADDR_ORDER=1 restores it here.
                floor = jnp.where(kc >= n, -jnp.inf, cvals[:, -1])
                return _int2_fine_phase(
                    cvals, idx, packed4, scales4, qi8, qscale, k, nq,
                    fine_bits, floor,
                )
        elif n % _INT2_WINDOW == 0 and n // _INT2_WINDOW >= kc:
            # UNROLLED per-query select, never vmapped: vmapping the window
            # gather turns the clean 2D `jnp.take(blocks, widx, axis=0)` into
            # a batched gather that costs ~+2.5 ms/query at 10M (probe_int2o:
            # full pipeline 6.4 ms vmapped / 4.2 ms via take_along_axis /
            # 2.1 ms unrolled).  The unroll is LINEAR in Q in both compile
            # time and runtime: the searcher only routes single queries here
            # (searcher._INT2_MAX_Q = 1, measured crossover probe_int2r) and
            # direct callers (recall/probe harnesses) stay <= 8.
            outs = [_select_topk_hier(coarse[i], kc) for i in range(nq)]
            cvals = jnp.stack([v for v, _ in outs])
            idx = jnp.stack([p for _, p in outs])
        else:  # small corpus: plain top_k is cheap there
            cvals, idx = jax.lax.top_k(coarse, kc)
        floor = jnp.where(kc >= n, -jnp.inf, cvals[:, -1])
        # The gather below runs ADDRESS-ORDERED (argsort of (Q, kc) indices
        # first): an isolated sorted-index column gather measured 0.14 ms vs
        # 0.52 ms score-ordered (probe_int2g) — the gather coalesces
        # ascending addresses.  Composed-pipeline effect is within
        # measurement weather (probe_int2l: 7.0-7.4 ms both ways); kept
        # because it is never slower and the argsort is noise.
        order = jnp.argsort(idx, axis=1)
        idx = jnp.take_along_axis(idx, order, axis=1)
        cvals = jnp.take_along_axis(cvals, order, axis=1)
    return _int2_fine_phase(
        cvals, idx, packed4, scales4, qi8, qscale, k, nq, fine_bits, floor
    )


def _int2_fine_phase(cvals, idx, packed4, scales4, qi8, qscale, k, nq, fine_bits, floor):
    """Fine pass shared by the select branches: gather the candidates'
    int4/int8 columns, rescore, keep the best k.  Invalid slots carry -inf
    coarse scores; re-mask after the gather so garbage fine bytes can't
    resurface them."""
    depth = idx.shape[1]
    cols = jnp.take(packed4, idx.reshape(-1), axis=1)  # (D', Q*depth)
    if fine_bits == 8:
        lv = cols.reshape(-1, nq, depth)  # already (D, Q, depth) int8 levels
    else:
        lv = unpack_int4_xla(cols).reshape(-1, nq, depth)  # (D, Q, depth) int8
    iscores = jnp.einsum(
        "qd,dqk->qk", qi8, lv, preferred_element_type=jnp.int32
    )
    fine = (
        iscores.astype(jnp.float32)
        * jnp.take(scales4, idx)
        * qscale
    )
    fine = jnp.where(jnp.isfinite(cvals), fine, -jnp.inf)
    kf = min(k, depth)
    vals, perm = jax.lax.top_k(fine, kf)
    rows = jnp.take_along_axis(idx, perm, axis=1)
    rows = jnp.where(jnp.isfinite(vals), rows, -1)
    if kf < k:  # tiny corpus: pad to the requested k like the other scans
        pad_v = jnp.full((nq, k - kf), -jnp.inf, vals.dtype)
        pad_r = jnp.full((nq, k - kf), -1, rows.dtype)
        vals = jnp.concatenate([vals, pad_v], axis=1)
        rows = jnp.concatenate([rows, pad_r], axis=1)
    return vals, rows, floor


@functools.partial(jax.jit, static_argnames=("k", "engine", "interpret", "n_sweep", "fine_bits", "select", "fetch"))
def _scan_topk_int2(
    packed2, scales2, packed4, scales4, source_ids, q, allowed, k: int,
    engine: str, interpret: bool, n_sweep: int = 0, fine_bits: int = 4,
    select: str = "auto", fetch: int = 0,
):
    return scan_int2_coarse_fine(
        packed2, scales2, packed4, scales4, source_ids, q, allowed, k,
        engine=engine, interpret=interpret, n_sweep=n_sweep, fine_bits=fine_bits,
        select=select, fetch=fetch,
    )


def scan_topk_int2(packed2, scales2, packed4, scales4, source_ids, q, allowed, k: int, engine: str, n_sweep: int = 0, fine_bits: int = 4, select: str = "auto", fetch: int = 0):
    """Int2 coarse-to-fine candidates (approximate fine-companion scores;
    the Searcher reranks the fine candidates in f32.  An escalation never
    re-runs the coarse pass: the searcher demotes to a FULL fine-companion
    sweep (use_coarse=False), which restores that tier's floor semantics —
    the coarse depth itself is effectively constant, since the depth rule
    (Searcher._coarse_pays) only routes k <= INT2_COARSE_FETCH/2 here)."""
    from ..utils.platform import platform_of

    interpret = engine == "pallas" and platform_of(packed2) != "tpu"
    return _scan_topk_int2(
        packed2, scales2, packed4, scales4, source_ids, q, allowed, k,
        engine, interpret, n_sweep, fine_bits, select, fetch,
    )
