"""D3DP diffusion wrapper: DDIM sampler + train forward parity vs the
reference, with identical injected noise (RNG streams can't match across
frameworks, so the reference's torch draws are replayed into our sampler)."""

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
B, H, K, F, J = 2, 3, 4, 9, 17
CS, DEP = 64, 2


def small_cfg(**over):
    return D3DPConfig(
        model=MixSTEConfig(num_frames=F, embed_dim=CS, depth=DEP),
        num_proposals=H,
        sampling_timesteps=K,
        joints_left=tuple(JL),
        joints_right=tuple(JR),
        **over,
    )


def ref_args(**over):
    base = dict(
        number_of_frames=F,
        timestep=1000,
        scale=1.0,
        cs=CS,
        dep=DEP,
        test_time_augmentation=True,
    )
    base.update(over)
    return types.SimpleNamespace(**base)


class TestSampler:
    def test_shapes_and_determinism(self, rng):
        d3dp = D3DP(small_cfg())
        params = d3dp.init_params(jax.random.PRNGKey(0))
        x2d = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
        x2d_flip = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
        out = d3dp.sample(params, jax.random.PRNGKey(1), x2d, x2d_flip)
        assert out.shape == (B, K, H, F, J, 3)
        out2 = d3dp.sample(params, jax.random.PRNGKey(1), x2d, x2d_flip)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
        out3 = d3dp.sample(params, jax.random.PRNGKey(2), x2d, x2d_flip)
        assert not np.allclose(np.asarray(out), np.asarray(out3))

    def test_train_forward_shape(self, rng):
        d3dp = D3DP(small_cfg())
        params = d3dp.init_params(jax.random.PRNGKey(0))
        x2d = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
        x3d = jnp.asarray(rng.randn(B, F, J, 3), jnp.float32)
        pred = d3dp.train_forward(params, jax.random.PRNGKey(1), x2d, x3d)
        assert pred.shape == (B, F, J, 3)

    def test_unit_scale_3dhp(self, rng):
        """3DHP mm-scaling: output ~1000x the metre-scale config's range."""
        d3dp_m = D3DP(small_cfg())
        d3dp_mm = D3DP(small_cfg(unit_scale=1000.0))
        params = d3dp_m.init_params(jax.random.PRNGKey(0))
        x2d = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
        x2d_f = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
        out_m = np.asarray(d3dp_m.sample(params, jax.random.PRNGKey(1), x2d, x2d_f))
        out_mm = np.asarray(d3dp_mm.sample(params, jax.random.PRNGKey(1), x2d, x2d_f))
        np.testing.assert_allclose(out_mm, out_m * 1000.0, rtol=1e-6)


@needs_ref
class TestParity:
    def _make_pair(self, is_train, num_proposals=H, sampling_timesteps=K):
        """Reference D3DP + our D3DP sharing converted weights."""
        import torch

        ref_mod = import_reference("common.diffusionpose")
        torch.manual_seed(0)
        ref_model = ref_mod.D3DP(
            ref_args(),
            JL,
            JR,
            is_train=is_train,
            num_proposals=num_proposals,
            sampling_timesteps=sampling_timesteps,
        )
        ref_model.eval()
        ours = D3DP(small_cfg())
        params = {
            "params": torch_mixste_to_flax(
                ref_model.pose_estimator.state_dict(), depth=DEP
            )
        }
        return ref_model, ours, params

    def test_ddim_sample_flip_parity(self, rng):
        import torch

        ref_model, ours, params = self._make_pair(is_train=False)
        x2d = rng.randn(B, F, J, 2).astype(np.float32)
        x2d_flip = x2d.copy()
        x2d_flip[..., 0] *= -1
        x2d_flip[:, :, JL + JR] = x2d_flip[:, :, JR + JL]

        torch.manual_seed(123)
        with torch.no_grad():
            expected = ref_model(
                torch.from_numpy(x2d),
                None,
                input_2d_flip=torch.from_numpy(x2d_flip),
            ).numpy()  # (B,K,H,F,J,3)

        # replay the exact torch RNG stream: img0, then K-1 step noises
        torch.manual_seed(123)
        img0 = torch.randn(B, H, F, J, 3).numpy()
        noises = np.zeros((K, B, H, F, J, 3), np.float32)
        for i in range(K - 1):
            noises[i] = torch.randn(B, H, F, J, 3).numpy()

        got = np.asarray(
            ours.sample(
                params,
                jax.random.PRNGKey(0),
                jnp.asarray(x2d),
                jnp.asarray(x2d_flip),
                noise_override=(img0, noises),
            )
        )
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=5e-4)

    @pytest.mark.slow
    def test_ddim_flagship_parity(self, rng):
        """End-to-end DDIM parity at the FLAGSHIP config: 243 frames,
        cs=512, dep=8, H=5 hypotheses, K=5 steps, flip TTA — the README's
        quick-eval headline. Verifies the <=0.05 mm claim at full scale
        (reference: common/diffusionpose.py:214-256), not extrapolated from
        the small-dim test above."""
        import torch

        Bf, Hf, Kf, Ff = 1, 5, 5, 243
        ref_mod = import_reference("common.diffusionpose")
        torch.manual_seed(0)
        ref_model = ref_mod.D3DP(
            ref_args(number_of_frames=Ff, cs=512, dep=8),
            JL, JR, is_train=False,
            num_proposals=Hf, sampling_timesteps=Kf,
        )
        ref_model.eval()
        ours = D3DP(D3DPConfig(
            model=MixSTEConfig(num_frames=Ff, embed_dim=512, depth=8),
            num_proposals=Hf, sampling_timesteps=Kf,
            joints_left=tuple(JL), joints_right=tuple(JR),
        ))
        params = {"params": torch_mixste_to_flax(
            ref_model.pose_estimator.state_dict(), depth=8)}

        x2d = rng.randn(Bf, Ff, J, 2).astype(np.float32)
        x2d_flip = x2d.copy()
        x2d_flip[..., 0] *= -1
        x2d_flip[:, :, JL + JR] = x2d_flip[:, :, JR + JL]

        torch.manual_seed(123)
        with torch.no_grad():
            expected = ref_model(
                torch.from_numpy(x2d), None,
                input_2d_flip=torch.from_numpy(x2d_flip),
            ).numpy()

        torch.manual_seed(123)
        img0 = torch.randn(Bf, Hf, Ff, J, 3).numpy()
        noises = np.zeros((Kf, Bf, Hf, Ff, J, 3), np.float32)
        for i in range(Kf - 1):
            noises[i] = torch.randn(Bf, Hf, Ff, J, 3).numpy()

        got = np.asarray(ours.sample(
            params, jax.random.PRNGKey(0),
            jnp.asarray(x2d), jnp.asarray(x2d_flip),
            noise_override=(img0, noises),
        ))
        assert got.shape == expected.shape
        delta_mm = np.abs(got - expected).max() * 1000.0  # metres -> mm
        print(f"flagship DDIM max pose delta: {delta_mm:.5f} mm")
        assert delta_mm <= 0.05, f"{delta_mm} mm"

    def test_train_forward_parity(self, rng):
        import torch

        ref_model, ours, params = self._make_pair(is_train=True)
        x2d = rng.randn(B, F, J, 2).astype(np.float32)
        x3d = rng.randn(B, F, J, 3).astype(np.float32)

        torch.manual_seed(7)
        with torch.no_grad():
            expected = ref_model(
                torch.from_numpy(x2d), torch.from_numpy(x3d)
            ).numpy()

        # replay per-sample (t, noise) draws from prepare_targets
        torch.manual_seed(7)
        ts, noises = [], []
        for _ in range(B):
            ts.append(int(torch.randint(0, 1000, (1,)).item()))
            noises.append(torch.randn(F, J, 3).numpy())
        got = np.asarray(
            ours.train_forward(
                params,
                jax.random.PRNGKey(0),
                jnp.asarray(x2d),
                jnp.asarray(x3d),
                train=False,  # reference model is in eval() for determinism
                t_noise_override=(np.asarray(ts), np.stack(noises)),
            )
        )
        np.testing.assert_allclose(got, expected, atol=2e-4)


def test_sampler_flip_equivariance(rng):
    """Swapping the TTA input pair and mirroring the injected noise must
    mirror the samples exactly — a strong invariant of the fused flip-TTA
    denoise + DDIM update wiring."""
    from d3dp_tpu.diffusion import flip_pose, make_lr_perm

    d3dp = D3DP(small_cfg())
    params = d3dp.init_params(jax.random.PRNGKey(0))
    perm = make_lr_perm(J, JL, JR)

    x2d = rng.randn(B, F, J, 2).astype(np.float32)
    x2d_flip = x2d.copy()
    x2d_flip[..., 0] *= -1
    x2d_flip[:, :, JL + JR] = x2d_flip[:, :, JR + JL]

    z0 = rng.randn(B, H, F, J, 3).astype(np.float32)
    zs = rng.randn(K, B, H, F, J, 3).astype(np.float32)

    def mirror(a):
        return np.asarray(flip_pose(jnp.asarray(a), jnp.asarray(perm)))

    out1 = np.asarray(d3dp.sample(
        params, jax.random.PRNGKey(1), jnp.asarray(x2d), jnp.asarray(x2d_flip),
        noise_override=(z0, zs)))
    out2 = np.asarray(d3dp.sample(
        params, jax.random.PRNGKey(2), jnp.asarray(x2d_flip), jnp.asarray(x2d),
        noise_override=(mirror(z0), np.stack([mirror(z) for z in zs]))))
    np.testing.assert_allclose(out2, mirror(out1), atol=2e-5)
