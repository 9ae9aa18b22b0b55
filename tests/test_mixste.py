"""MixSTE2 model: shape checks + numerical parity vs the reference torch
implementation with converted weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from d3dp_tpu.models import MixSTE2, MixSTEConfig
from d3dp_tpu.train.convert_torch import torch_mixste_to_flax
from tests.reference_oracle import reference_available, import_reference

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

SMALL = dict(num_frames=9, num_joints=17, embed_dim=64, depth=2, num_heads=8)


def make_model(**over):
    cfg = MixSTEConfig(**{**SMALL, **over})
    return MixSTE2(cfg), cfg


class TestShapes:
    def test_forward_shape(self, rng):
        model, cfg = make_model()
        B, F, J = 3, cfg.num_frames, cfg.num_joints
        x2d = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
        x3d = jnp.asarray(rng.randn(B, F, J, 3), jnp.float32)
        t = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x2d, x3d, t)
        out = model.apply(params, x2d, x3d, t)
        assert out.shape == (B, F, J, 3)
        assert out.dtype == jnp.float32

    def test_deterministic_dropout_flag(self, rng):
        model, cfg = make_model(drop_path_rate=0.5)
        B, F, J = 4, cfg.num_frames, cfg.num_joints
        x2d = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
        x3d = jnp.asarray(rng.randn(B, F, J, 3), jnp.float32)
        t = jnp.zeros((B,), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x2d, x3d, t)
        out1 = model.apply(params, x2d, x3d, t, deterministic=True)
        out2 = model.apply(params, x2d, x3d, t, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        # stochastic depth changes outputs between rng keys
        oa = model.apply(
            params, x2d, x3d, t, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        ob = model.apply(
            params, x2d, x3d, t, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert not np.allclose(np.asarray(oa), np.asarray(ob))


@needs_ref
class TestParity:
    def _reference_model(self, is_train, frames=9, cs=64, dep=2):
        import torch

        ref = import_reference("common.mixste")
        torch.manual_seed(0)
        model = ref.MixSTE2(
            num_frame=frames,
            num_joints=17,
            in_chans=2,
            embed_dim_ratio=cs,
            depth=dep,
            num_heads=8,
            mlp_ratio=2.0,
            qkv_bias=True,
            qk_scale=None,
            drop_path_rate=0.0,
            is_train=is_train,
        )
        model.eval()
        return model

    def test_train_rank4_parity(self, rng):
        import torch

        B, F, J = 2, 9, 17
        ref_model = self._reference_model(is_train=True)
        x2d = rng.randn(B, F, J, 2).astype(np.float32)
        x3d = rng.randn(B, F, J, 3).astype(np.float32)
        t = rng.randint(0, 1000, (B,)).astype(np.int64)
        with torch.no_grad():
            expected = ref_model(
                torch.from_numpy(x2d), torch.from_numpy(x3d), torch.from_numpy(t)
            ).numpy()

        model, _ = make_model()
        flax_params = {"params": torch_mixste_to_flax(ref_model.state_dict(), depth=2)}
        got = np.asarray(
            model.apply(
                flax_params,
                jnp.asarray(x2d),
                jnp.asarray(x3d),
                jnp.asarray(t, jnp.int32),
            )
        )
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_eval_rank5_parity(self, rng):
        """Reference rank-5 (hypotheses) path == our flattened-batch forward."""
        import torch

        B, H, F, J = 2, 3, 9, 17
        ref_model = self._reference_model(is_train=False)
        x2d = rng.randn(B, F, J, 2).astype(np.float32)
        x3d = rng.randn(B, H, F, J, 3).astype(np.float32)
        t = rng.randint(0, 1000, (B,)).astype(np.int64)
        with torch.no_grad():
            expected = ref_model(
                torch.from_numpy(x2d), torch.from_numpy(x3d), torch.from_numpy(t)
            ).numpy()  # (B,H,F,J,3)

        model, _ = make_model()
        flax_params = {"params": torch_mixste_to_flax(ref_model.state_dict(), depth=2)}
        # fold H into batch: repeat conditioning per hypothesis
        x2d_f = np.repeat(x2d[:, None], H, axis=1).reshape(B * H, F, J, 2)
        x3d_f = x3d.reshape(B * H, F, J, 3)
        t_f = np.repeat(t[:, None], H, axis=1).reshape(B * H)
        got = np.asarray(
            model.apply(
                flax_params,
                jnp.asarray(x2d_f),
                jnp.asarray(x3d_f),
                jnp.asarray(t_f, jnp.int32),
            )
        ).reshape(B, H, F, J, 3)
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_full_size_parity(self, rng):
        """One forward at the real config (243x17, cs=512, dep=8)."""
        import torch

        B, F, J = 1, 243, 17
        ref_model = self._reference_model(is_train=True, frames=F, cs=512, dep=8)
        x2d = rng.randn(B, F, J, 2).astype(np.float32)
        x3d = rng.randn(B, F, J, 3).astype(np.float32)
        t = np.array([999], dtype=np.int64)
        with torch.no_grad():
            expected = ref_model(
                torch.from_numpy(x2d), torch.from_numpy(x3d), torch.from_numpy(t)
            ).numpy()

        model = MixSTE2(MixSTEConfig(num_frames=F, embed_dim=512, depth=8))
        flax_params = {"params": torch_mixste_to_flax(ref_model.state_dict(), depth=8)}
        got = np.asarray(
            model.apply(
                flax_params,
                jnp.asarray(x2d),
                jnp.asarray(x3d),
                jnp.asarray(t, jnp.int32),
            )
        )
        np.testing.assert_allclose(got, expected, atol=2e-4)
