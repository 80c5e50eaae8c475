"""Is the bf16 Pallas kernel's top-10 exact at 10M x 384 with batched
queries?  Compare against jnp.einsum + lax.top_k on the same matrix, and
against the einsum-rerank of the kernel's own candidates — isolates kernel
vs rerank as the source of the recall_10m rank flips."""

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import ALLOW_ALL, pallas_topk_unsorted

N, D, K, B = 10_002_432, 384, 10, 64
CHUNK = N // 8


@jax.jit
def gen(key):
    x = jax.random.normal(key, (CHUNK, D), jnp.float32)
    return (x / jnp.linalg.norm(x, axis=-1, keepdims=True)).astype(jnp.bfloat16)


def main():
    upd = jax.jit(lambda m, c, i: jax.lax.dynamic_update_slice(m, c, (i, 0)), donate_argnums=(0,))
    matrix = jnp.zeros((N, D), jnp.bfloat16)
    for j, kk in enumerate(jax.random.split(jax.random.PRNGKey(0), 8)):
        matrix = upd(matrix, gen(kk), jnp.int32(j * CHUNK))
    jax.block_until_ready(matrix)
    src2d = jnp.zeros((1, N), jnp.int32)
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))

    @jax.jit
    def kernel_top10(m, s2, q):
        v, r = pallas_topk_unsorted(m, s2, q.astype(jnp.bfloat16), allowed, 16, False)
        sv, sp = jax.lax.top_k(v, K)
        return jnp.take_along_axis(r, sp, 1), sv

    @jax.jit
    def xla_top10(m, q):
        scores = jax.lax.dot_general(
            q.astype(jnp.bfloat16), m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v, r = jax.lax.top_k(scores, K)
        return r, v

    @jax.jit
    def rerank_top10(m, q, crows):
        cand = m[crows].astype(jnp.float32)  # (B, 16, D)
        qb = q.astype(jnp.bfloat16).astype(jnp.float32)
        exact = jnp.einsum("bkd,bd->bk", cand, qb)
        sv, sp = jax.lax.top_k(exact, K)
        return jnp.take_along_axis(crows, sp, 1), sv

    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qj = jnp.asarray(q)

    kv_rows, kv = (np.asarray(x) for x in kernel_top10(matrix, src2d, qj))
    xv_rows, xv = (np.asarray(x) for x in xla_top10(matrix, qj))
    # rerank over the kernel's own 16 candidates
    cr16, _ = pallas_topk_unsorted(matrix, src2d, qj.astype(jnp.bfloat16), allowed, 16, False)
    _, craw = pallas_topk_unsorted(matrix, src2d, qj.astype(jnp.bfloat16), allowed, 16, False)
    rv_rows, rv = (np.asarray(x) for x in rerank_top10(matrix, qj, craw))

    kx = sum(set(kv_rows[i]) != set(xv_rows[i]) for i in range(B))
    kr = sum(set(kv_rows[i]) != set(rv_rows[i]) for i in range(B))
    print(f"kernel vs XLA oracle: {kx}/{B} queries differ")
    print(f"kernel vs einsum-rerank of its own candidates: {kr}/{B} queries differ")
    for i in range(B):
        if set(kv_rows[i]) != set(xv_rows[i]):
            print(f"q{i} kernel rows {kv_rows[i].tolist()} scores {kv[i].round(5).tolist()}")
            print(f"q{i} xla    rows {xv_rows[i].tolist()} scores {xv[i].round(5).tolist()}")
            break
    for i in range(B):
        if set(kv_rows[i]) != set(rv_rows[i]):
            print(f"q{i} kernel rows {kv_rows[i].tolist()} scores {kv[i].round(5).tolist()}")
            print(f"q{i} rerank rows {rv_rows[i].tolist()} scores {rv[i].round(5).tolist()}")
            break


if __name__ == "__main__":
    main()
