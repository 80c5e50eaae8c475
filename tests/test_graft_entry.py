"""Driver entry-point self-containment (VERDICT r1: MULTICHIP gate).

The driver calls __graft_entry__.dryrun_multichip(n) in ITS environment, not
the test suite's: conftest.py's platform override must not be load-bearing.
These tests run the dryrun in a subprocess with XLA_FLAGS / JAX_PLATFORMS
stripped — the entry has to set up its own virtual CPU devices even when the
process would otherwise see only the single real TPU.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(env_overrides: dict, drop: tuple = ()) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items() if k not in drop}
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )


def test_dryrun_multichip_clean_env():
    """No XLA_FLAGS, no JAX_PLATFORMS — the entry must self-provision the
    8 virtual CPU devices (the exact MULTICHIP_r01 failure environment)."""
    r = _run_dryrun({}, drop=("XLA_FLAGS", "JAX_PLATFORMS"))
    assert r.returncode == 0, f"rc={r.returncode}\nstdout={r.stdout}\nstderr={r.stderr}"
    assert "dryrun_multichip ok" in r.stdout


def test_dryrun_multichip_driver_flags():
    """Driver-style environment: the host-platform device-count flag is set
    but the platform is NOT forced to cpu (so a TPU plugin, when present,
    still claims the default backend)."""
    r = _run_dryrun(
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        drop=("JAX_PLATFORMS",),
    )
    assert r.returncode == 0, f"rc={r.returncode}\nstdout={r.stdout}\nstderr={r.stderr}"
    assert "dryrun_multichip ok" in r.stdout


def test_make_mesh_raises_on_underprovision():
    """make_mesh must refuse to silently build a smaller mesh than asked
    (VERDICT r1 weak #8)."""
    import jax

    from perceive_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="available"):
        make_mesh(len(jax.devices()) + 1)


def test_tp_shardings_insert_allreduce():
    """The Megatron-style param specs must make GSPMD insert a cross-model
    collective (all-reduce) after the row-parallel matmuls — guards against
    silent weight replication (VERDICT r1 weak #8 follow-up)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from perceive_tpu.models import EncoderArch, HeadConfig
    from perceive_tpu.models.encoder import init_params, make_encode_fn
    from perceive_tpu.parallel import batch_sharding, make_mesh, shard_params

    mesh = make_mesh(8, model_parallel=2)
    arch = EncoderArch(
        vocab_size=64, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=32,
    )
    head = HeadConfig(pooling="mean", normalize=True)
    params = init_params(jax.random.PRNGKey(0), arch, head)
    fn = make_encode_fn(arch, head, compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, (8, 16)).astype(np.int32))
    with mesh:
        sp = shard_params(params, mesh)
        ids_s = jax.device_put(ids, batch_sharding(mesh))
        mask_s = jax.device_put(jnp.ones_like(ids), batch_sharding(mesh))
        types_s = jax.device_put(jnp.zeros_like(ids), batch_sharding(mesh))
        txt = jax.jit(fn).lower(sp, ids_s, mask_s, types_s).compile().as_text()
    assert "all-reduce" in txt, "TP shardings compiled without any all-reduce"
