"""HostMirror: RAM -> mmap spill, bf16 element mode, rerank/snapshot reads
(VERDICT r2 #3 — corpus scale capped by HBM, not host RAM)."""

import numpy as np
import pytest

import jax.numpy as jnp

from perceive_tpu.index.matrix import EmbeddingMatrix, HostMirror
from perceive_tpu.index.searcher import Searcher


def test_mirror_grow_ram_then_spill(monkeypatch, tmp_path):
    m = HostMirror(64, 16, ram_budget=64 * 16 * 4, dir=str(tmp_path))
    assert not m.is_mmap
    rng = np.random.default_rng(0)
    v = rng.standard_normal((64, 16)).astype(np.float32)
    m.write(np.arange(64), v, 16)
    m.grow(256)  # exceeds the RAM budget -> spills, data preserved
    assert m.is_mmap
    np.testing.assert_array_equal(m.read_f32(slice(0, 64), 16), v)
    m.grow(1024)  # mmap growth extends the file in place
    assert m.arr.shape == (1024, 16)
    np.testing.assert_array_equal(m.read_f32(slice(0, 64), 16), v)
    path = m.path
    import os

    assert os.path.getsize(path) == 1024 * 16 * 4
    m.close()
    assert not os.path.exists(path)


def test_mirror_bf16_mode(monkeypatch):
    monkeypatch.setenv("PERCEIVE_TPU_MIRROR_DTYPE", "bfloat16")
    m = EmbeddingMatrix(16, dtype=np.float32)
    import ml_dtypes

    assert m._mirror.dtype == np.dtype(ml_dtypes.bfloat16)
    rng = np.random.default_rng(1)
    v = rng.standard_normal((8, 16)).astype(np.float32)
    m.upsert(list(range(1, 9)), [0] * 8, v)
    got = m.host_vectors_for([m.row_of[1]])
    assert got.dtype == np.float32
    np.testing.assert_allclose(got[0], v[0], rtol=1e-2)  # bf16 rounding


def test_mmap_mirror_rerank_exact_and_snapshot(monkeypatch, tmp_path):
    """With the mirror spilled to disk, the quantized tier's f32 rerank and
    the snapshot writer read through the mmap and stay exact."""
    monkeypatch.setenv("PERCEIVE_TPU_MIRROR_RAM_GB", str(64 * 1024 / 2**30))  # 64 KB
    rng = np.random.default_rng(2)
    n, d, k = 600, 32, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    s = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)
    assert s.matrix._mirror.is_mmap  # 600 * 128 * 4 B > 64 KB

    q = vecs[17] + 0.01 * rng.standard_normal(d).astype(np.float32)
    hits = s.search_vector(q, k)
    scores = vecs @ q
    want = np.argsort(-scores, kind="stable")[:k] + 1
    assert [i for i, _ in hits] == list(want)  # rerank through mmap is exact
    np.testing.assert_allclose(
        [v for _, v in hits], np.sort(scores)[::-1][:k], rtol=1e-5
    )

    snap = str(tmp_path / "mm.npz")
    assert s.matrix.save_snapshot(snap) == "full"
    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    assert len(m2) == n
    from perceive_tpu.index.matrix import chunk_key

    np.testing.assert_allclose(
        m2.host_vectors_for([m2.row_of[chunk_key(18)]])[0], vecs[17], rtol=1e-6
    )


def test_lazy_groups_accounting():
    """Single chunk-0 items carry no group dict entry; multi-chunk items do,
    and the multi_chunk_groups counter stays exact through add/remove."""
    m = EmbeddingMatrix(8, dtype=np.float32)
    from perceive_tpu.index.matrix import chunk_key

    v = np.ones((1, 8), np.float32)
    m.upsert([chunk_key(1, 0)], [0], v)
    assert m.groups == {} and m.multi_chunk_groups == 0
    assert m.keys_of_group(1) == [chunk_key(1, 0)]
    m.upsert([chunk_key(1, 1)], [0], v)
    assert m.multi_chunk_groups == 1
    assert sorted(m.keys_of_group(1)) == [chunk_key(1, 0), chunk_key(1, 1)]
    m.remove([chunk_key(1, 1)])
    assert m.multi_chunk_groups == 0
    assert m.keys_of_group(1) == [chunk_key(1, 0)]
    m.remove([chunk_key(1, 0)])
    assert m.keys_of_group(1) == []
    assert len(m) == 0


def test_compact_through_mmap_mirror(monkeypatch, tmp_path):
    """Compaction's vectorized arr[dsts] = arr[srcs] block move must work
    when the mirror has spilled to a memory-mapped file, and searches stay
    exact afterwards (round-3: compaction + mirror-spill interplay)."""
    import jax.numpy as jnp

    monkeypatch.setenv("PERCEIVE_TPU_MIRROR_RAM_GB", str(64 * 1024 / 2**30))
    monkeypatch.setenv("PERCEIVE_TPU_MIRROR_DIR", str(tmp_path))
    rng = np.random.default_rng(31)
    d, n = 32, 12_000
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    s = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    s.upsert_embeddings(list(range(1, 8001)), [0] * 8000, vecs[:8000])
    s.upsert_embeddings(list(range(8001, n + 1)), [1] * 4000, vecs[8000:])
    m = s.matrix
    assert m._mirror.is_mmap
    assert m.remove_source(0) == 8000
    assert m.rows == 4000  # compacted through the mmap
    q = vecs[8000 + 99] + 0.005 * rng.standard_normal(d).astype(np.float32)
    exact = vecs @ q
    exact[:8000] = -np.inf
    want = (np.argsort(-exact, kind="stable")[:5] + 1).tolist()
    assert [i for i, _ in s.search_vector(q, 5)] == want
