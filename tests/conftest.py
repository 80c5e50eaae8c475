"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform *before* jax is imported so
multi-chip sharding tests (mesh, pjit, collectives) run anywhere.  Real-TPU
benchmarking lives in bench.py, not the test suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture()
def tmp_db(tmp_path):
    from perceive_tpu.db import Database

    db = Database(tmp_path / "test.sqlite3")
    yield db
    db.close()
