"""Device mesh construction and sharding rules.

The reference has no multi-device story at all (SURVEY.md §2: intra-process
channels only).  This module is the TPU-native scaling layer: one 2D mesh
with axes

  * ``data``  — batch/data parallelism for ingest embedding (the
    "shard embed batches across chips" axis), and together with ``model``
    the row axis for the sharded corpus matrix;
  * ``model`` — tensor parallelism for the encoder tower (attention heads
    and FFN columns), sized 1 for MiniLM-class models but real: param
    shardings below make XLA insert the psum after o_proj / ffn_out.

Collectives are never written by hand on the encode path — shardings in,
XLA GSPMD out.  The explicit collective lives in the query engine
(perceive_tpu.parallel.search: per-chip top-k + all_gather merge).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
# Corpus rows shard over every device (both axes flattened)
ROWS_AXES = (DATA_AXIS, MODEL_AXIS)


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    model_parallel: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"asked for {n_devices} devices but only {len(devices)} available "
                f"({devices[0].platform if devices else 'none'}); pass devices= "
                "explicitly (e.g. jax.devices('cpu') under "
                "xla_force_host_platform_device_count) instead of silently "
                "under-provisioning"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# -- encoder tensor-parallel param shardings ---------------------------------

# Per-leaf PartitionSpec for the encoder param tree (leading dim of layer
# leaves is the lax.scan layer axis).  Column-parallel into attention/FFN,
# row-parallel out — the standard Megatron split, expressed as shardings.
_LAYER_SPECS = {
    "q_w": P(None, None, MODEL_AXIS),
    "k_w": P(None, None, MODEL_AXIS),
    "v_w": P(None, None, MODEL_AXIS),
    "q_b": P(None, MODEL_AXIS),
    "k_b": P(None, MODEL_AXIS),
    "v_b": P(None, MODEL_AXIS),
    "o_w": P(None, MODEL_AXIS, None),
    "ffn_in_w": P(None, None, MODEL_AXIS),
    "ffn_in_b": P(None, MODEL_AXIS),
    "ffn_out_w": P(None, MODEL_AXIS, None),
}


def param_specs(params) -> dict:
    """PartitionSpec tree matching an encoder param tree (replicated where no
    TP rule applies: embeddings, layernorms, biases of row-parallel mats)."""

    def spec_for(group: str, name: str, leaf) -> P:
        if group == "layers" and name in _LAYER_SPECS:
            return _LAYER_SPECS[name]
        return P()

    return {
        group: {name: spec_for(group, name, leaf) for name, leaf in sub.items()}
        for group, sub in params.items()
    }


def shard_params(params, mesh: Mesh):
    """Place an encoder param tree on the mesh with TP shardings."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, S) token batches shard over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def rows_sharding(mesh: Mesh) -> NamedSharding:
    """(N, D) corpus matrix shards rows over every device."""
    return NamedSharding(mesh, P(ROWS_AXES, None))


def rows_1d_sharding(mesh: Mesh) -> NamedSharding:
    """(N,) per-row metadata (source ids) shards like the matrix rows."""
    return NamedSharding(mesh, P(ROWS_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
