from d3dp_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    mixste_param_spec,
    shard_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "mixste_param_spec",
    "shard_params",
]
