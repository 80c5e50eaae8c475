"""Probe: empirical p50(N) scaling of the default int2 coarse-to-fine tier,
to put the v5p extrapolation on a measured footing.

The <2 ms BASELINE target names a v5p; the bench chip is a v5e-class part
(~819 GB/s HBM, bf16 sweep measured 740 GB/s).  The extrapolation argument
is that the pipeline decomposes into a bandwidth-proportional part (the
0.25 B/dim coarse sweep + score write/read) and a ~fixed selection/fine
part (sorts, block gathers, 4096-column fine rescore).  This probe measures
that decomposition directly: single-query p50 at six corpus sizes (prefix
sweeps of ONE 24M-row allocation, so every case shares arrays and compiled
structure), interleaved A/B/.../F so chip weather cancels, then a linear
fit  p50(N) = slope*N + intercept.

  * slope  -> implied streaming bytes/s over the 96+4+4 B/row the sweep
    touches (packed read + score write + select re-read); should land near
    the chip's measured streaming ceiling, confirming bandwidth-boundness.
  * intercept -> the N-independent selection+fine cost.

v5p projection = slope*N * (measured_bw / v5p_bw_equal_eff) + intercept *
r_fix, bracketed for r_fix in {1.0 (sorts don't speed up), 0.5 (sorts track
clock ~2x)}.  Run on an idle chip; first compiles are ~6 programs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bench import rand_i8_chunked  # full-size random.bits peaks ~3x (OOM at 24M)
from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D4, K, allowed_np, queries
from perceive_tpu.ops.topk import scan_int2_coarse_fine


def gen_packed_chunked(key, r, n):
    """(r, n) uint8 random packed matrix without the 3x generation peak."""
    return jax.block_until_ready(
        jax.lax.bitcast_convert_type(rand_i8_chunked(key, (r, n), 24), jnp.uint8)
    )

# Two configurations: the 24M reach with the int4 companion (the HBM-budget
# rule's choice there), or --int8 for the DEFAULT tier's exact shape (int8
# companion, sizes up to 10M: 0.96+3.84 GB resident).
import sys

INT8_MODE = "--int8" in sys.argv
if INT8_MODE:
    N_FULL = 12288 * 814  # 10,002,432 rows (the bench corpus)
    SWEEPS = [12288 * k for k in (136, 272, 407, 543, 678, 814)]
else:
    N_FULL = 12288 * 1954  # 24,010,752 rows (tile-aligned, probe_int2_24m)
    SWEEPS = [12288 * k for k in (328, 656, 984, 1312, 1640, 1954)]
R = 8
ROUNDS = 9
BYTES_PER_ROW = D // 4 + 4 + 4  # packed read + score write + select re-read
V5E_BW, V5P_BW = 819e9, 2765e9


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed_chunked(jax.random.PRNGKey(2), D4, N_FULL)
    # int4 fine companion: the HBM-budget rule's choice at 24M on this chip
    # (an int8 companion is 9.2 GB and OOMs next to the 2.3 GB coarse);
    # the companion only moves the N-independent intercept, not the slope
    if INT8_MODE:
        from bench import _rand_i8t

        fine4 = _rand_i8t(jax.random.PRNGKey(8), D, N_FULL)
    else:
        fine4 = gen_packed_chunked(jax.random.PRNGKey(8), D // 2, N_FULL)
    scales = jax.block_until_ready(jnp.full((N_FULL,), 0.01, jnp.float32))
    src = jax.block_until_ready(jnp.zeros((N_FULL,), jnp.int32))
    print(f"arrays resident ({N_FULL} rows, companion={8 if INT8_MODE else 4}-bit)", flush=True)

    def body(n_sweep):
        def f(q, p2, sc, s1, m8):
            v, rows, fl = scan_int2_coarse_fine(
                p2, sc, m8, sc, s1, q, allowed, K,
                fine_bits=8 if INT8_MODE else 4, n_sweep=n_sweep,
            )
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
        return f

    cases = {
        f"{n // 1_000_000}M({n})": (body(n), (packed2, scales, src, fine4))
        for n in SWEEPS
    }
    marg = ab_interleaved_marginal(cases, queries, r=R, rounds=ROUNDS)
    report(marg)
    ok = [(n, k) for n, k in zip(SWEEPS, cases) if k in marg]
    if len(ok) < 3:
        raise SystemExit(f"only {len(ok)} sizes ran; no fit")
    ns = np.array([n for n, _ in ok], dtype=np.float64)
    p50s = np.array([np.median(marg[k]) for _, k in ok], dtype=np.float64)
    slope, intercept = np.polyfit(ns, p50s, 1)
    resid = p50s - (slope * ns + intercept)
    bw = BYTES_PER_ROW / slope
    print(
        f"fit: p50 = {slope * 1e9:.4f} ns/row * N + {intercept * 1e3:.3f} ms"
        f"  (max |resid| {np.abs(resid).max() * 1e3:.3f} ms)\n"
        f"implied streaming bandwidth over {BYTES_PER_ROW} B/row: "
        f"{bw / 1e9:.0f} GB/s (chip ceiling ~{V5E_BW / 1e9:.0f})",
        flush=True,
    )
    for n in (10_002_432, 24_010_752):
        base = slope * n + intercept
        for r_fix, label in ((1.0, "sorts flat"), (0.5, "sorts 2x")):
            # bandwidth part scaled by V5E/V5P at equal achieved efficiency
            proj = slope * n * (V5E_BW / V5P_BW) + intercept * r_fix
            print(
                f"v5p projection @ {n // 1_000_000}M rows ({label}): "
                f"{proj * 1e3:.2f} ms   (measured here: {base * 1e3:.2f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()
