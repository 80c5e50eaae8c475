"""Calibrate the approx-select risk gate: measure the coarse-RANK
displacement of oracle-top-10 rows on the three recall corpora.  The
PartialReduce select drops a row with prob ~(rank-1)/L (bin collision),
so mean-rank/L estimates candidate-miss; this probe grounds the audit
gate constants (searcher._approx_risk_*)."""
import sys
import jax, jax.numpy as jnp, numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "gaussian"
sys.argv = sys.argv[:1]  # recall_int2 parses argv at import
import benchmarks.recall_int2 as R
from perceive_tpu.ops.topk import (
    ALLOW_ALL, pallas_int2_scores, pallas_topk_unsorted, quantize_queries,
)

N, D, D4 = R.N, R.D, R.D4
NQ = 48

def main():
    assert jax.default_backend() == "tpu"
    # corpus: bf16 oracle + packed int2 (reuse recall_int2 generators)
    keys = jax.random.split(jax.random.PRNGKey(0), N // R.CHUNK)
    upd_rows = jax.jit(lambda m, c, i: jax.lax.dynamic_update_slice(m, c, (i, 0)),
                       donate_argnums=(0,))
    upd_cols = jax.jit(lambda m, c, i: jax.lax.dynamic_update_slice(m, c, (jnp.int32(0), i)),
                       donate_argnums=(0,))
    matrix = jnp.zeros((N, D), jnp.bfloat16)
    p2 = jnp.zeros((D4, N), jnp.uint8)
    s2 = jnp.zeros((N,), jnp.float32)
    centers = None
    R.MODE = MODE
    if MODE in ("clustered", "clustered2"):
        centers = jax.block_until_ready(R._normalize(
            jax.random.normal(jax.random.PRNGKey(99), (R.N_CLUSTERS, D), jnp.float32)))
    for j, kk in enumerate(keys):
        c = (R._gen_chunk_clustered(kk, centers, j * R.CHUNK)
             if centers is not None else R._gen_chunk_bf16(kk))
        off = jnp.int32(j * R.CHUNK)
        matrix = upd_rows(matrix, c, off)
        a, sa = R._pack_chunk_int2(c)
        p2 = upd_cols(p2, a, off)
        s2 = jax.lax.dynamic_update_slice(s2, sa, (off,))
        del c, a, sa
    jax.block_until_ready((matrix, p2, s2))
    src = jnp.zeros((N,), jnp.int32)
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))
    print("corpus built", flush=True)

    @jax.jit
    def ranks_of_top10(q):
        ov, orows = pallas_topk_unsorted(
            matrix, src.reshape(1, N), q.astype(jnp.bfloat16), allowed, 16, False)
        _, op = jax.lax.top_k(ov, 10)
        rows10 = jnp.take_along_axis(orows, op, axis=1)[0]
        qi8, qsc = quantize_queries(q)
        coarse = pallas_int2_scores(
            p2, s2.reshape(1, N), src.reshape(1, N), qi8, qsc, allowed, False, N)[0]
        thr = coarse[rows10]  # (10,)
        counts = jnp.sum((coarse[None, :] >= thr[:, None]).astype(jnp.int32), axis=1)
        return counts

    rng = np.random.default_rng(3)
    centers_np = np.asarray(centers) if centers is not None else None
    allr = []
    perq = []
    for i in range(NQ):
        q = rng.standard_normal((1, D)).astype(np.float32)
        if centers_np is not None:
            q /= np.linalg.norm(q)
            q = centers_np[rng.integers(0, R.N_CLUSTERS)][None, :] + 0.2 * q
        q /= np.linalg.norm(q)
        r = np.asarray(ranks_of_top10(jnp.asarray(q)))
        allr.append(r)
        perq.append(r.mean())
    allr = np.concatenate(allr)
    perq = np.array(perq)
    # bin count of the shipped operating point
    buf, _ = jax.eval_shape(
        lambda x: jax.lax.approx_max_k(x, 4096, recall_target=0.98,
                                       aggregate_to_topk=False),
        jax.ShapeDtypeStruct((N,), jnp.float32))
    L = buf.shape[0]
    print(f"[{MODE}] rank of oracle-top-10 in coarse order ({NQ} queries):")
    print(f"  mean {allr.mean():.1f}  p50 {np.median(allr):.0f}  "
          f"p90 {np.percentile(allr, 90):.0f}  p99 {np.percentile(allr, 99):.0f}  "
          f"max {allr.max()}")
    print(f"  per-query mean-rank: p50 {np.median(perq):.1f} max {perq.max():.1f}")
    print(f"  L={L}  est. miss mean {allr.mean()/L:.2e}  "
          f"per-query max {perq.max()/L:.2e}", flush=True)

if __name__ == "__main__":
    main()
