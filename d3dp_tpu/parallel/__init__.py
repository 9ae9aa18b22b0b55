from d3dp_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    step_noise_sharding,
    replicated_sharding,
    mixste_param_spec,
    shard_params,
)
from d3dp_tpu.parallel.multihost import (
    initialize_multihost,
    global_batch,
    host_slice,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "step_noise_sharding",
    "replicated_sharding",
    "mixste_param_spec",
    "shard_params",
    "initialize_multihost",
    "global_batch",
    "host_slice",
]
