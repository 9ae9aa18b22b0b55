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
