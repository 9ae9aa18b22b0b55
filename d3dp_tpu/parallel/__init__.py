from d3dp_tpu.parallel.mesh import (
    make_mesh,
    auto_mesh,
    round_up_batch,
    shard_batch_fn,
    batch_sharding,
    step_noise_sharding,
    replicated_sharding,
    mixste_param_spec,
    shard_params,
    shard_model_params,
    replicate_stray_leaves,
    put_global,
)
from d3dp_tpu.parallel.multihost import (
    initialize_multihost,
    global_batch,
    host_slice,
)

__all__ = [
    "make_mesh",
    "auto_mesh",
    "round_up_batch",
    "shard_batch_fn",
    "batch_sharding",
    "step_noise_sharding",
    "replicated_sharding",
    "mixste_param_spec",
    "shard_params",
    "shard_model_params",
    "replicate_stray_leaves",
    "put_global",
    "initialize_multihost",
    "global_batch",
    "host_slice",
]
