"""Multi-host (DCN) support: process-group init + global-batch assembly.

The reference has no multi-node story at all (its only multi-device
mechanism is single-process nn.DataParallel, main.py:241-248). Here the
single-chip -> pod-slice -> multi-slice path is uniform: the same jitted
train/eval steps run over a global ('dp','tp') Mesh; what changes per scale
is only (a) process-group initialisation and (b) how host-local numpy
batches become global arrays. At D3DP's size (~34M params, 270MB grad
all-reduce per ~51ms step) dp spans DCN comfortably — gradients are the
only cross-slice traffic.

Single-host runs never need this module.
"""

import numpy as np
import jax

from d3dp_tpu.parallel.mesh import batch_sharding


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Join the JAX process group. Must run before first backend use.

    With no arguments, defers to cloud auto-detection (TPU pod metadata) —
    the normal path on real pods. Explicit arguments support manual
    bring-up (e.g. `--coordinator-address host:1234 --num-hosts 2
    --host-id 0/1`). Returns (process_index, process_count).
    """
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def global_batch(mesh, *host_arrays):
    """Assemble per-host numpy batches into dp-sharded GLOBAL jax.Arrays.

    Each host passes its LOCAL slice of the batch (leading axis =
    global_batch // process_count, identical padded shapes everywhere —
    the generators' pad_last contract). Returns one global Array per input,
    sharded over the mesh's 'dp' axis, usable directly by the jitted step.
    """
    sharding = batch_sharding(mesh)
    out = []
    for a in host_arrays:
        a = np.asarray(a)
        global_shape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
        out.append(jax.make_array_from_process_local_data(
            sharding, a, global_shape))
    return out if len(out) > 1 else out[0]


def host_slice(batch_axis_size):
    """This host's [lo, hi) share of a global batch axis."""
    n, i = jax.process_count(), jax.process_index()
    per = batch_axis_size // n
    return i * per, (i + 1) * per
