"""Checkpoint IO: our pickle format round-trip + loading reference torch
.bin files through load_any."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from d3dp_tpu.train.checkpoint_io import save_checkpoint, load_checkpoint, load_any
from tests.reference_oracle import reference_available, import_reference

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


def test_pickle_roundtrip(tmp_path, rng):
    from d3dp_tpu.train.state import TrainState, make_optimizer
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig

    d3dp = D3DP(D3DPConfig(model=MixSTEConfig(num_frames=9, embed_dim=64,
                                              depth=2)))
    params = d3dp.init_params(jax.random.PRNGKey(0))
    tx = make_optimizer(1e-4)
    state = TrainState.create(params, tx)

    gen_rng = np.random.RandomState(7)
    path = str(tmp_path / "ckpt.ckpt")
    save_checkpoint(path, epoch=3, lr=5e-5, params=state.params,
                    opt_state=state.opt_state, generator_random_state=gen_rng,
                    min_loss=42.0)
    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 3 and ckpt["lr"] == 5e-5
    assert ckpt["min_loss"] == 42.0
    # params round-trip exactly
    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(ckpt["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state structure restores into jnp
    restored = jax.tree_util.tree_map(jnp.asarray, ckpt["opt_state"])
    assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(
        state.opt_state)
    # RNG state draws identically
    assert ckpt["random_state"].randint(1000) == np.random.RandomState(7).randint(1000)


@needs_ref
def test_load_reference_bin(tmp_path, rng):
    """A torch .bin in the reference's exact save format loads and matches
    the source model numerically."""
    import torch

    ref = import_reference("common.mixste")
    torch.manual_seed(0)
    model = ref.MixSTE2(num_frame=9, num_joints=17, in_chans=2,
                        embed_dim_ratio=64, depth=2, num_heads=8,
                        mlp_ratio=2.0, qkv_bias=True, drop_path_rate=0.0,
                        is_train=True)
    model.eval()
    # the reference wraps in DataParallel and prefixes 'module.pose_estimator.'
    state_dict = {
        "module.pose_estimator." + k: v for k, v in model.state_dict().items()
    }
    path = str(tmp_path / "ref.bin")
    torch.save({"epoch": 77, "lr": 1e-5, "model_pos": state_dict,
                "optimizer": None, "random_state": None}, path)

    ckpt = load_any(path, depth=2)
    assert ckpt["epoch"] == 77

    from d3dp_tpu.models import MixSTE2, MixSTEConfig

    ours = MixSTE2(MixSTEConfig(num_frames=9, embed_dim=64, depth=2))
    x2d = jnp.asarray(rng.randn(2, 9, 17, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(2, 9, 17, 3), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    got = np.asarray(ours.apply(
        jax.tree_util.tree_map(jnp.asarray, ckpt["params"]), x2d, x3d, t))
    with torch.no_grad():
        expected = model(
            torch.from_numpy(np.array(x2d)),
            torch.from_numpy(np.array(x3d)),
            torch.zeros(2, dtype=torch.long),
        ).numpy()
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_orbax_roundtrip(tmp_path):
    from d3dp_tpu.train.checkpoint_io import (
        save_checkpoint_orbax, load_checkpoint_orbax)
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig

    d3dp = D3DP(D3DPConfig(model=MixSTEConfig(num_frames=9, embed_dim=64,
                                              depth=2)))
    params = d3dp.init_params(jax.random.PRNGKey(0))
    d = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(d, epoch=5, lr=1e-4, params=params, min_loss=9.0)
    ckpt = load_checkpoint_orbax(d)
    assert ckpt["epoch"] == 5 and ckpt["min_loss"] == 9.0
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ckpt["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
