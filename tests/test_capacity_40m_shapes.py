"""40M-row capacity tier over an 8-device mesh — shape/program soundness
(VERDICT r3 #8, trace-level half).

The full 40M end-to-end run (build -> snapshot -> query walls) needs the
real chip and ~10 GB HBM (benchmarks/capacity_40m.py); what a CPU test
CAN pin down is that the production sharded programs are well-formed at
that scale: the row counts divide the mesh, every shard_map spec matches
the transposed packed layouts, and the compiled output shapes are the
contract shapes.  jax.eval_shape traces the very functions production
dispatches (no arrays are materialized — 40M x 384 int4 is 7.7 GB packed,
61 GB f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceive_tpu.parallel import make_mesh
from perceive_tpu.parallel.search import _sharded_scan, _sharded_scan_int2

NDEV = 8
N = 40_108_032  # 40M target, divisible by 8 * 512 (shard and tile clean)
D = 384
K = 128


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < NDEV:
        pytest.skip("needs the 8-device CPU mesh (conftest XLA_FLAGS)")
    return make_mesh(NDEV)


def test_40m_int4_sharded_program_shapes(mesh):
    """The capacity tier (int4, transposed packed) at 40M x 384 over 8
    devices traces to the contract output shapes."""
    sd = jax.ShapeDtypeStruct
    out = jax.eval_shape(
        lambda p4, s4, src, q, al: _sharded_scan(
            p4, s4, src, q, al, mesh=mesh, k=K, engine="xla",
            interpret=False, int8t=False,
        ),
        sd((D // 2, N), jnp.uint8),
        sd((N,), jnp.float32),
        sd((N,), jnp.int32),
        sd((1, D), jnp.float32),
        sd((16,), jnp.int32),
    )
    vals, rows = out
    assert vals.shape == (1, K) and vals.dtype == jnp.float32
    assert rows.shape == (1, K) and rows.dtype in (jnp.int32, jnp.int64)


def test_40m_int2_sharded_program_shapes(mesh):
    """The default-tier coarse-to-fine program at the 40M boundary (the
    24M auto-retier threshold is per-chip; 40M/8 = 5M per chip keeps
    int2 viable on larger meshes) also traces clean, floor included."""
    sd = jax.ShapeDtypeStruct
    vals, rows, floor = jax.eval_shape(
        lambda p2, s2, p4, s4, src, q, al: _sharded_scan_int2(
            p2, s2, p4, s4, src, q, al, mesh=mesh, k=K, engine="xla",
            interpret=False, fine_bits=4, select="exact",
        ),
        sd((D // 4, N), jnp.uint8),
        sd((N,), jnp.float32),
        sd((D // 2, N), jnp.uint8),
        sd((N,), jnp.float32),
        sd((N,), jnp.int32),
        sd((1, D), jnp.float32),
        sd((16,), jnp.int32),
    )
    assert vals.shape == (1, K)
    assert rows.shape == (1, K)
    assert floor.shape == (1,)


def test_40m_rows_divide_the_mesh():
    assert N % (NDEV * 512) == 0  # clean shards, no ragged kernel tiles
    assert N >= 40_000_000
