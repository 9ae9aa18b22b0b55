"""Convert reference PyTorch D3DP checkpoints to d3dp_tpu flax params.

The reference saves `{'model_pos': state_dict, 'epoch', 'lr', 'optimizer',
'random_state'}` (main.py:543-552) where state_dict keys carry a
DataParallel `module.` prefix and a `pose_estimator.` prefix for the MixSTE2
denoiser (common/diffusionpose.py:125). Torch Linear weights are (out, in);
flax Dense kernels are (in, out) — transposed here.
"""

import numpy as np


def _t(w):
    """torch (out,in) Linear weight -> flax (in,out) kernel."""
    return np.ascontiguousarray(np.asarray(w).T)


def _a(w):
    return np.asarray(w)


def torch_mixste_to_flax(state_dict, depth: int):
    """Map a reference MixSTE2 state_dict to this package's flax params tree.

    state_dict: mapping name -> array-like (torch tensors or numpy). Names may
    carry 'module.' and/or 'pose_estimator.' prefixes. Returns the flax
    'params' subtree for models.mixste.MixSTE2.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("pose_estimator."):
            k = k[len("pose_estimator."):]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = v

    p = {}
    p["joint_embed"] = {
        "kernel": _t(sd["Spatial_patch_to_embedding.weight"]),
        "bias": _a(sd["Spatial_patch_to_embedding.bias"]),
    }
    p["spatial_pos_embed"] = _a(sd["Spatial_pos_embed"])
    p["temporal_pos_embed"] = _a(sd["Temporal_pos_embed"])
    p["time_mlp_fc1"] = {
        "kernel": _t(sd["time_mlp.1.weight"]),
        "bias": _a(sd["time_mlp.1.bias"]),
    }
    p["time_mlp_fc2"] = {
        "kernel": _t(sd["time_mlp.3.weight"]),
        "bias": _a(sd["time_mlp.3.bias"]),
    }

    def block(prefix):
        return {
            "norm1": {
                "scale": _a(sd[f"{prefix}.norm1.weight"]),
                "bias": _a(sd[f"{prefix}.norm1.bias"]),
            },
            "attn": {
                "qkv": {
                    "kernel": _t(sd[f"{prefix}.attn.qkv.weight"]),
                    "bias": _a(sd[f"{prefix}.attn.qkv.bias"]),
                },
                "proj": {
                    "kernel": _t(sd[f"{prefix}.attn.proj.weight"]),
                    "bias": _a(sd[f"{prefix}.attn.proj.bias"]),
                },
            },
            "norm2": {
                "scale": _a(sd[f"{prefix}.norm2.weight"]),
                "bias": _a(sd[f"{prefix}.norm2.bias"]),
            },
            "mlp": {
                "fc1": {
                    "kernel": _t(sd[f"{prefix}.mlp.fc1.weight"]),
                    "bias": _a(sd[f"{prefix}.mlp.fc1.bias"]),
                },
                "fc2": {
                    "kernel": _t(sd[f"{prefix}.mlp.fc2.weight"]),
                    "bias": _a(sd[f"{prefix}.mlp.fc2.bias"]),
                },
            },
        }

    for i in range(depth):
        p[f"ste_{i}"] = block(f"STEblocks.{i}")
        p[f"tte_{i}"] = block(f"TTEblocks.{i}")

    p["spatial_norm"] = {
        "scale": _a(sd["Spatial_norm.weight"]),
        "bias": _a(sd["Spatial_norm.bias"]),
    }
    p["temporal_norm"] = {
        "scale": _a(sd["Temporal_norm.weight"]),
        "bias": _a(sd["Temporal_norm.bias"]),
    }
    p["head_norm"] = {
        "scale": _a(sd["head.0.weight"]),
        "bias": _a(sd["head.0.bias"]),
    }
    p["head"] = {
        "kernel": _t(sd["head.1.weight"]),
        "bias": _a(sd["head.1.bias"]),
    }
    return p


def load_pretrained_params(params, loaded):
    """Lenient weight merge: copy leaves whose path+shape match, keep the
    rest, report counts. (reference: common/utils.py:42-73 —
    load_pretrained_weights ignores unmatched layers.)"""
    import jax

    flat_p = {tuple(str(k) for k in kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_l = {tuple(str(k) for k in kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    matched, discarded = 0, 0
    out = dict(flat_p)
    for key, v in flat_l.items():
        if key in flat_p and np.shape(flat_p[key]) == np.shape(v):
            out[key] = v
            matched += 1
        else:
            discarded += 1
    print(f"load_weight {matched} (discarded {discarded})")
    # rebuild the tree
    treedef = jax.tree_util.tree_structure(params)
    keys = [tuple(str(k) for k in kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, [out[k] for k in keys])


def load_reference_checkpoint(path, depth: int = 8):
    """Load a reference .bin checkpoint file -> (flax params, metadata)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = torch_mixste_to_flax(ckpt["model_pos"], depth=depth)
    meta = {k: ckpt.get(k) for k in ("epoch", "lr") if k in ckpt}
    return params, meta
