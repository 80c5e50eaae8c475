from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    ROWS_AXES,
    batch_sharding,
    make_mesh,
    param_specs,
    replicated,
    rows_1d_sharding,
    rows_sharding,
    shard_params,
)
from .search import ShardedSearcher, sharded_scan_topk

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "ROWS_AXES",
    "ShardedSearcher",
    "batch_sharding",
    "make_mesh",
    "param_specs",
    "replicated",
    "rows_1d_sharding",
    "rows_sharding",
    "shard_params",
    "sharded_scan_topk",
]
