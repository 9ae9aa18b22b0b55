"""Device mesh + sharding rules: data parallel x tensor parallel.

The reference's only multi-device mechanism is single-process
nn.DataParallel replication (main.py:241-248). Here parallelism is the
JAX-native kind: a `jax.sharding.Mesh` with

  * 'dp' — batch (chunks / eval windows / hypotheses folded into batch)
  * 'tp' — tensor parallel over attention heads + MLP hidden of MixSTE2

Everything runs through `jax.jit` with NamedShardings; XLA GSPMD inserts the
collectives (grad psum over dp, activation all-reduces for tp) on ICI.
At D3DP's size (~34M params) pure dp is the sweet spot; tp exists to prove
out the sharding surface and for large-cs configs.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp=None, tp=1, devices=None):
    """Build a ('dp','tp') mesh. dp defaults to n_devices//tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def auto_mesh(dp=0, tp=1, devices=None):
    """Mesh from the CLI's --dp/--tp flags, mirroring the reference's
    multi-device-by-default behaviour (nn.DataParallel wraps every model
    unconditionally, main.py:241-248): with no explicit request (dp=0,
    tp=1) all visible devices become data-parallel. Returns None when the
    resolved mesh is a single device — callers then skip sharding entirely.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    tp = max(tp, 1)
    if tp > n:
        raise ValueError(f"--tp {tp} exceeds the {n} visible devices")
    if dp <= 0:
        dp = max(n // tp, 1)
    if dp * tp > n:
        raise ValueError(
            f"--dp {dp} x --tp {tp} exceeds the {n} visible devices")
    if dp * tp == 1:
        return None
    return make_mesh(dp=dp, tp=tp, devices=devices[: dp * tp])


def _batch_quantum(mesh):
    """Rows must divide over 'dp' AND split evenly across processes
    (multihost host_slice): lcm of the two."""
    return int(np.lcm(mesh.shape["dp"], jax.process_count()))


def round_up_batch(batch_size, mesh):
    """Smallest multiple of the batch quantum >= batch_size (eval
    micro-batches must divide over 'dp' and across hosts; the extra rows
    are weight-0 padding windows, so metrics are unchanged)."""
    if mesh is None:
        return batch_size
    q = _batch_quantum(mesh)
    return -(-batch_size // q) * q


def put_global(x, sharding):
    """Place a HOST-GLOBAL batch under a (possibly multi-process) sharding.

    Single process: plain device_put. Under jax.distributed, every host
    holds the identical global batch (the deterministic generators
    guarantee it), so each host contributes its contiguous host_slice via
    make_array_from_process_local_data — the jitted step then sees one
    global dp-sharded array, same as single-host."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    from d3dp_tpu.parallel.multihost import host_slice

    x = np.asarray(x)
    lo, hi = host_slice(x.shape[0])
    return jax.make_array_from_process_local_data(sharding, x[lo:hi], x.shape)


def shard_batch_fn(mesh, array_indices=(1, 2), weights_index=3):
    """to_device factory for the training Prefetcher under a mesh: pad the
    batch rows to the batch quantum (lcm of dp and process count) with
    zero-weight rows (the weighted loss is identical to the unsharded
    run), then place the array members with the batch sharding
    (put_global: multihost-aware). The weights member is padded but stays
    host-side numpy — the train loop reads w.sum() for its step count
    without forcing a device sync."""
    bs = batch_sharding(mesh)
    q = _batch_quantum(mesh)

    def fn(batch):
        out = list(batch)
        n = out[weights_index].shape[0]
        pad = (-n) % q
        if pad:
            for i in array_indices:
                if out[i] is not None:
                    z = ((0, pad),) + ((0, 0),) * (out[i].ndim - 1)
                    out[i] = np.pad(out[i], z)
            out[weights_index] = np.pad(
                np.asarray(out[weights_index]), (0, pad))
        for i in array_indices:
            if out[i] is not None:
                out[i] = put_global(out[i], bs)
        return tuple(out)

    return fn


def batch_sharding(mesh):
    """Leading-axis batch sharding over 'dp'."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def step_noise_sharding(mesh):
    """Sharding for DDIM replay-noise stacks shaped (K, batch, ...): the
    sampling-step axis leads, so the dp batch split applies to axis 1."""
    return NamedSharding(mesh, P(None, "dp"))


def _leaf_spec(path, leaf):
    """Tensor-parallel PartitionSpec for one MixSTE2 param leaf.

    Column-parallel (output dim over 'tp'): attn qkv, mlp fc1.
    Row-parallel (input dim over 'tp'): attn proj, mlp fc2.
    Everything else (norms, embeds, head) replicated.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    if leaf.ndim == 2:
        if ("qkv" in joined or "fc1" in joined) and joined.endswith("kernel"):
            return P(None, "tp")
        if ("attn/proj" in joined or "fc2" in joined) and joined.endswith("kernel"):
            return P("tp", None)
    if leaf.ndim == 1 and ("qkv" in joined or "fc1" in joined) and joined.endswith("bias"):
        return P("tp")
    return P()


def mixste_param_spec(params):
    """PartitionSpec pytree for MixSTE2 params (tp sharding rules)."""
    return jax.tree_util.tree_map_with_path(_leaf_spec, params)


def shard_params(params, mesh):
    """Place params on the mesh under the tp sharding rules."""
    specs = mixste_param_spec(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_model_params(params, mesh):
    """CLI entry-point helper: place a {'params': ...} pytree on the mesh
    under the tp rules; no-op without a mesh. One definition for every
    train/eval/render/in-the-wild branch."""
    if mesh is None:
        return params
    return {"params": shard_params(params["params"], mesh)}


def replicate_stray_leaves(tree, mesh):
    """Replicate onto the mesh any array leaf not already mesh-placed.

    optax state created from sharded params inherits their NamedShardings
    via zeros_like, but scalar leaves (step count, injected hyperparams)
    materialize on the default device — jit then rejects the mixed device
    sets. This placement is what makes a sharded TrainState jittable."""
    rep = NamedSharding(mesh, P())

    def place(x):
        if isinstance(x, jax.Array) and not isinstance(
                x.sharding, NamedSharding):
            return jax.device_put(x, rep)
        return x

    return jax.tree_util.tree_map(place, tree)
