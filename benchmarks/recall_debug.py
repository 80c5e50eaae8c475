"""Print rows+scores for queries where recall_10m's comparison fails —
oracle top-10 vs rerank top-10 over the int8 fetch, with the symmetric
difference spelled out.  Capture-free (arrays passed as jit args)."""

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    pallas_topk_int8_unsorted,
    pallas_topk_unsorted,
    quantize_queries,
)

N, D, K, FETCH = 10_002_432, 384, 10, 128
CHUNK = N // 8


@jax.jit
def gen(key):
    x = jax.random.normal(key, (CHUNK, D), jnp.float32)
    return (x / jnp.linalg.norm(x, axis=-1, keepdims=True)).astype(jnp.bfloat16)


@jax.jit
def pack8(c):
    f = c.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(f), axis=1), 1e-12) / 127.0
    return jnp.clip(jnp.round(f / s[:, None]), -127, 127).astype(jnp.int8), s


def main():
    upd = jax.jit(lambda m, c, i: jax.lax.dynamic_update_slice(m, c, (i, 0)), donate_argnums=(0,))
    matrix = jnp.zeros((N, D), jnp.bfloat16)
    quant = jnp.zeros((N, D), jnp.int8)
    scales = jnp.zeros((N,), jnp.float32)
    for j, kk in enumerate(jax.random.split(jax.random.PRNGKey(0), 8)):
        c = gen(kk)
        off = jnp.int32(j * CHUNK)
        matrix = upd(matrix, c, off)
        p, s = pack8(c)
        quant = upd(quant, p, off)
        scales = jax.lax.dynamic_update_slice(scales, s, (off,))
    jax.block_until_ready((matrix, quant, scales))
    scales2d = scales.reshape(1, N)
    src2d = jnp.zeros((1, N), jnp.int32)
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))

    @jax.jit
    def run(m, qnt, sc2, s2, q):
        ov, orows = pallas_topk_unsorted(m, s2, q.astype(jnp.bfloat16), allowed, 16, False)
        qi8, qsc = quantize_queries(q)
        cv, crows = pallas_topk_int8_unsorted(qnt, sc2, s2, qi8, qsc, allowed, FETCH, False)
        cand = m[jnp.clip(crows, 0, N - 1)]
        qb = q.astype(jnp.bfloat16)
        exact = jnp.einsum("qfd,qd->qf", cand, qb, preferred_element_type=jnp.float32)
        rv, rperm = jax.lax.top_k(exact, K)
        rrows = jnp.take_along_axis(crows, rperm, axis=1)
        osv, osp = jax.lax.top_k(ov, K)
        orows10 = jnp.take_along_axis(orows, osp, 1)
        return orows10, osv, rrows, rv, crows, exact

    rng = np.random.default_rng(1)
    B = 128
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    orows, osv, rrows, rv, crows, exact = (
        np.asarray(x) for x in run(matrix, quant, scales2d, src2d, jnp.asarray(q))
    )
    shown = nfail = 0
    for i in range(B):
        oset, rset = set(orows[i].tolist()), set(rrows[i].tolist())
        if oset == rset:
            continue
        nfail += 1
        if shown >= 3:
            continue
        shown += 1
        print(f"=== q{i}")
        print(f" oracle rows   {orows[i].tolist()}")
        print(f" oracle scores {[round(float(x), 6) for x in osv[i]]}")
        print(f" rerank rows   {rrows[i].tolist()}")
        print(f" rerank scores {[round(float(x), 6) for x in rv[i]]}")
        for r in sorted(oset ^ rset):
            where = "oracle-only" if r in oset else "rerank-only"
            pos = np.where(crows[i] == r)[0]
            es = float(exact[i, pos[0]]) if len(pos) else float("nan")
            print(f"  diff row {r} ({where}): in candidates={len(pos) > 0} rerank-score={es:.6f}")
    print(f"failing queries: {nfail}/{B}")


if __name__ == "__main__":
    main()
