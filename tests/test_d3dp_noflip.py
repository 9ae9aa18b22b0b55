"""Parity of the non-flip DDIM path (reference ddim_sample) and the
in-the-wild argument defaults."""

import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from d3dp_tpu.diffusion import D3DP, D3DPConfig
from d3dp_tpu.models.mixste import MixSTEConfig
from d3dp_tpu.train.convert_torch import torch_mixste_to_flax
from tests.reference_oracle import reference_available, import_reference

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

JL = [4, 5, 6, 11, 12, 13]
JR = [1, 2, 3, 14, 15, 16]
B, H, K, F, J = 2, 3, 3, 9, 17
CS, DEP = 64, 2


@needs_ref
def test_ddim_sample_noflip_parity(rng):
    """Reference ddim_sample (no TTA) == our flip_tta=False sampler with the
    same injected noise."""
    import torch

    ref_mod = import_reference("common.diffusionpose")
    torch.manual_seed(0)
    args = types.SimpleNamespace(
        number_of_frames=F, timestep=1000, scale=1.0, cs=CS, dep=DEP,
        test_time_augmentation=False)
    ref_model = ref_mod.D3DP(args, JL, JR, is_train=False, num_proposals=H,
                             sampling_timesteps=K)
    ref_model.eval()
    ref_model.device = "cpu"  # ddim_sample reads self.device (cuda-only attr)

    # The reference's non-flip path is latently broken: predict_noise_from_start
    # promotes to float64 (the flip path patches this with .float() at
    # diffusionpose.py:167, the non-flip path doesn't — and no entry point
    # ever calls it). Wrap the denoiser with an fp32 cast so the oracle runs.
    import torch.nn as nn

    class CastWrap(nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, x2d, x3d, t):
            return self.inner(x2d.float(), x3d.float(), t)

    ref_model.pose_estimator = CastWrap(ref_model.pose_estimator)

    x2d = rng.randn(B, F, J, 2).astype(np.float32)
    torch.manual_seed(5)
    with torch.no_grad():
        # reference returns a LIST of per-step predictions here (quirk,
        # diffusionpose.py:212) — stack to compare
        expected = torch.stack(
            ref_model(torch.from_numpy(x2d), None), dim=1).numpy()

    torch.manual_seed(5)
    img0 = torch.randn(B, H, F, J, 3).numpy()
    noises = np.zeros((K, B, H, F, J, 3), np.float32)
    for i in range(K - 1):
        # the broken reference path promotes img to float64 AFTER the first
        # DDIM update, so randn_like draws f32 once then doubles — replay
        # the exact dtype sequence to match the RNG stream
        dt = torch.float32 if i == 0 else torch.float64
        noises[i] = torch.randn(
            B, H, F, J, 3, dtype=dt).numpy().astype(np.float32)

    ours = D3DP(D3DPConfig(
        model=MixSTEConfig(num_frames=F, embed_dim=CS, depth=DEP),
        num_proposals=H, sampling_timesteps=K, flip_tta=False,
        joints_left=tuple(JL), joints_right=tuple(JR)))
    params = {"params": torch_mixste_to_flax(
        ref_model.pose_estimator.inner.state_dict(), depth=DEP)}
    got = np.asarray(ours.sample(
        params, jax.random.PRNGKey(0), jnp.asarray(x2d),
        noise_override=(img0, noises)))
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_in_the_wild_defaults():
    """in-the-wild argument defaults match the reference's variant
    (in_the_wild/arguments_diffusion.py: stride 1, 120 epochs, lr 4e-5,
    lrd 0.99, num_proposals 5)."""
    from d3dp_tpu.cli.arguments import parse_args

    args = parse_args([], in_the_wild=True)
    assert args.stride == 1
    assert args.epochs == 120
    assert abs(args.learning_rate - 4e-5) < 1e-12
    assert abs(args.lr_decay - 0.99) < 1e-12

    base = parse_args([])
    assert base.stride == 243 and base.epochs == 400
    assert abs(base.learning_rate - 6e-5) < 1e-12
