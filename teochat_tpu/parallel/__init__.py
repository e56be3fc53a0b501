from teochat_tpu.parallel.mesh import create_mesh, local_mesh
from teochat_tpu.parallel.sharding import (
    param_specs,
    shard_params,
    batch_spec,
    cache_spec,
)

__all__ = [
    "create_mesh",
    "local_mesh",
    "param_specs",
    "shard_params",
    "batch_spec",
    "cache_spec",
]
