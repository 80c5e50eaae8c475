"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform *before* jax is imported so
multi-chip sharding tests (mesh, pjit, collectives) run anywhere.  Real-TPU
benchmarking lives in bench.py, not the test suite.
"""

import os

# NOTE: in this container the axon TPU plugin force-prepends itself to
# jax_platforms even when JAX_PLATFORMS=cpu is set, so the env var alone is
# not enough — update the config programmatically before any test imports jax.
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_db(tmp_path):
    from perceive_tpu.db import Database

    db = Database(tmp_path / "test.sqlite3")
    yield db
    db.close()
