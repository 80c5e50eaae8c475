"""Similarity math helpers — semantic spec of the reference's tensor helpers
(/root/reference/crates/perceive-core/lib.rs:63-77).

These are the *reference semantics* for scoring; the production query path
fuses them into the Pallas scan kernel (ops.topk).  ``dot_product`` is what
the highlight engine scores chunks with (model/highlight.rs:109); the cosine
variants normalize by vector NORMS — unlike the reference's HNSW distance
(search.rs:270-278) which divided by vector *dimension* and was only
monotonicity-correct for normalized embeddings (a quirk we deliberately do
not copy; see index.searcher docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def dot_product(query: jax.Array, values: jax.Array) -> jax.Array:
    """(D,) or (1,D) query x (N,D) values -> (N,) dot scores
    (reference lib.rs:63-65)."""
    q = query.reshape(-1)
    return jnp.einsum("d,nd->n", q, values, preferred_element_type=jnp.float32)


@jax.jit
def cosine_similarity_single_query(query: jax.Array, values: jax.Array) -> jax.Array:
    """(D,) query vs (N,D) values -> (N,) cosines (reference lib.rs:67-71)."""
    q = query.reshape(-1)
    qn = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    vn = values / jnp.maximum(jnp.linalg.norm(values, axis=1, keepdims=True), 1e-12)
    return jnp.einsum("d,nd->n", qn, vn, preferred_element_type=jnp.float32)


@jax.jit
def cosine_similarity_multi_query(queries: jax.Array, values: jax.Array) -> jax.Array:
    """(Q,D) x (N,D) -> (Q,N) cosines (reference lib.rs:73-77)."""
    qn = queries / jnp.maximum(jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    vn = values / jnp.maximum(jnp.linalg.norm(values, axis=1, keepdims=True), 1e-12)
    return jnp.einsum("qd,nd->qn", qn, vn, preferred_element_type=jnp.float32)
