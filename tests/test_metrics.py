"""Metric family parity vs the reference torch/numpy implementations."""

import numpy as np
import pytest
import jax.numpy as jnp

from d3dp_tpu.metrics import (
    mpjpe,
    mpjpe_diffusion,
    mpjpe_diffusion_all_min,
    mpjpe_diffusion_reproj,
    mpjpe_diffusion_3dhp,
    n_mpjpe,
    mean_velocity_error_train,
    p_mpjpe,
    p_mpjpe_diffusion,
    p_mpjpe_diffusion_all_min,
    p_mpjpe_diffusion_reproj,
)
from tests.reference_oracle import reference_available, import_reference

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

B, K, H, F, J = 2, 3, 4, 5, 17


@pytest.fixture
def data(rng):
    pred = rng.randn(B, K, H, F, J, 3).astype(np.float32)
    target = rng.randn(B, F, J, 3).astype(np.float32)
    reproj = rng.randn(B, K, H, F, J, 2).astype(np.float32)
    target_2d = rng.randn(B, F, J, 2).astype(np.float32)
    return pred, target, reproj, target_2d


@needs_ref
class TestParityP1:
    def test_mpjpe(self, rng):
        import torch

        ref = import_reference("common.loss")
        a = rng.randn(4, 9, J, 3).astype(np.float32)
        b = rng.randn(4, 9, J, 3).astype(np.float32)
        expected = ref.mpjpe(torch.from_numpy(a), torch.from_numpy(b)).item()
        got = float(mpjpe(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - expected) < 5e-6  # fp32 reduction-order noise

    def test_p_best(self, data):
        import torch

        ref = import_reference("common.loss")
        pred, target, _, _ = data
        expected = ref.mpjpe_diffusion(
            torch.from_numpy(pred), torch.from_numpy(target)
        ).numpy()
        got = np.asarray(mpjpe_diffusion(jnp.asarray(pred), jnp.asarray(target)))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_p_agg(self, data):
        import torch

        ref = import_reference("common.loss")
        pred, target, _, _ = data
        expected = ref.mpjpe_diffusion(
            torch.from_numpy(pred), torch.from_numpy(target), mean_pos=True
        ).numpy()
        got = np.asarray(
            mpjpe_diffusion(jnp.asarray(pred), jnp.asarray(target), mean_pos=True)
        )
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_j_best(self, data):
        import torch

        ref = import_reference("common.loss")
        pred, target, _, _ = data
        expected = ref.mpjpe_diffusion_all_min(
            torch.from_numpy(pred), torch.from_numpy(target)
        ).numpy()
        got = np.asarray(
            mpjpe_diffusion_all_min(jnp.asarray(pred), jnp.asarray(target))
        )
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_j_agg(self, data):
        import torch

        ref = import_reference("common.loss")
        pred, target, reproj, target_2d = data
        expected = ref.mpjpe_diffusion_reproj(
            torch.from_numpy(pred),
            torch.from_numpy(target),
            torch.from_numpy(reproj),
            torch.from_numpy(target_2d),
        ).numpy()
        got = np.asarray(
            mpjpe_diffusion_reproj(
                jnp.asarray(pred),
                jnp.asarray(target),
                jnp.asarray(reproj),
                jnp.asarray(target_2d),
            )
        )
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_3dhp_masked(self, data):
        import torch

        ref = import_reference("common.loss")
        pred, target, _, _ = data
        valid = np.array([[1, 1, 0, 1, 0], [1, 0, 1, 1, 1]], dtype=bool)
        # reference expects valid_frame shaped (B, F, 1)
        vf_torch = torch.from_numpy(valid[:, :, None])
        expected = ref.mpjpe_diffusion_3dhp(
            torch.from_numpy(pred), torch.from_numpy(target), vf_torch
        ).numpy()
        got = np.asarray(
            mpjpe_diffusion_3dhp(
                jnp.asarray(pred), jnp.asarray(target), jnp.asarray(valid)
            )
        )
        np.testing.assert_allclose(got, expected, atol=1e-6)

        expected_m = ref.mpjpe_diffusion_3dhp(
            torch.from_numpy(pred), torch.from_numpy(target), vf_torch, mean_pos=True
        ).numpy()
        got_m = np.asarray(
            mpjpe_diffusion_3dhp(
                jnp.asarray(pred), jnp.asarray(target), jnp.asarray(valid), mean_pos=True
            )
        )
        np.testing.assert_allclose(got_m, expected_m, atol=1e-6)

    def test_n_mpjpe_and_velocity(self, rng):
        import torch

        ref = import_reference("common.loss")
        a = rng.randn(4, 9, J, 3).astype(np.float32)
        b = rng.randn(4, 9, J, 3).astype(np.float32)
        expected = ref.n_mpjpe(torch.from_numpy(a), torch.from_numpy(b)).item()
        got = float(n_mpjpe(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - expected) < 1e-6

        expected_v = ref.mean_velocity_error_train(
            torch.from_numpy(a), torch.from_numpy(b), axis=1
        ).item()
        got_v = float(mean_velocity_error_train(jnp.asarray(a), jnp.asarray(b), axis=1))
        assert abs(got_v - expected_v) < 1e-6


@pytest.fixture
def realistic_data(rng):
    """Predictions near the target — the regime Procrustes actually sees."""
    target = rng.randn(B, F, J, 3).astype(np.float32)
    pred = target[:, None, None] + 0.05 * rng.randn(B, K, H, F, J, 3).astype(
        np.float32
    )
    reproj = rng.randn(B, K, H, F, J, 2).astype(np.float32)
    target_2d = rng.randn(B, F, J, 2).astype(np.float32)
    return pred.astype(np.float32), target, reproj, target_2d


@needs_ref
class TestParityP2Numpy:
    """Host numpy backend must match the reference bit-for-bit-ish (<1e-6)."""

    def test_p_mpjpe(self, rng):
        from d3dp_tpu.metrics.procrustes_np import p_mpjpe_np

        ref = import_reference("common.loss")
        a = rng.randn(6, J, 3).astype(np.float32)
        b = rng.randn(6, J, 3).astype(np.float32)
        expected = ref.p_mpjpe(a, b)
        assert abs(p_mpjpe_np(a, b) - expected) < 1e-7

    def test_all_modes(self, data):
        import torch
        from d3dp_tpu.metrics.procrustes_np import (
            p_mpjpe_diffusion_np,
            p_mpjpe_diffusion_all_min_np,
            p_mpjpe_diffusion_reproj_np,
        )

        ref = import_reference("common.loss")
        pred, target, reproj, target_2d = data
        tp, tt = torch.from_numpy(pred), torch.from_numpy(target)

        np.testing.assert_allclose(
            p_mpjpe_diffusion_np(pred, target), ref.p_mpjpe_diffusion(tp, tt), atol=1e-6
        )
        np.testing.assert_allclose(
            p_mpjpe_diffusion_all_min_np(pred, target),
            ref.p_mpjpe_diffusion_all_min(tp, tt),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            p_mpjpe_diffusion_np(pred, target, mean_pos=True),
            ref.p_mpjpe_diffusion(tp, tt, mean_pos=True),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            p_mpjpe_diffusion_reproj_np(pred, target, reproj, target_2d),
            ref.p_mpjpe_diffusion_reproj(
                tp, tt, torch.from_numpy(reproj), torch.from_numpy(target_2d)
            ),
            atol=1e-6,
        )


@needs_ref
class TestParityP2Device:
    """On-device (XLA SVD, fp32) vs reference on realistic poses.

    XLA's fp32 SVD differs from LAPACK at ~1e-4; the authoritative P2 numbers
    use the numpy backend above (parity <1e-6). This guards the jnp variant
    against gross errors only."""

    def test_p2_modes_device(self, realistic_data):
        import torch

        ref = import_reference("common.loss")
        pred, target, reproj, target_2d = realistic_data
        tp, tt = torch.from_numpy(pred), torch.from_numpy(target)

        got = np.asarray(p_mpjpe_diffusion(jnp.asarray(pred), jnp.asarray(target)))
        np.testing.assert_allclose(got, ref.p_mpjpe_diffusion(tp, tt), atol=5e-4)

        got_j = np.asarray(
            p_mpjpe_diffusion_all_min(jnp.asarray(pred), jnp.asarray(target))
        )
        np.testing.assert_allclose(
            got_j, ref.p_mpjpe_diffusion_all_min(tp, tt), atol=5e-4
        )

        got_r = np.asarray(
            p_mpjpe_diffusion_reproj(
                jnp.asarray(pred),
                jnp.asarray(target),
                jnp.asarray(reproj),
                jnp.asarray(target_2d),
            )
        )
        expected_r = ref.p_mpjpe_diffusion_reproj(
            tp, tt, torch.from_numpy(reproj), torch.from_numpy(target_2d)
        )
        np.testing.assert_allclose(got_r, expected_r, atol=5e-4)


class TestInternal:
    """Reference-free invariants (always run)."""

    def test_pbest_le_pagg(self, data):
        pred, target, _, _ = data
        p_best = np.asarray(mpjpe_diffusion(jnp.asarray(pred), jnp.asarray(target)))
        j_best = np.asarray(
            mpjpe_diffusion_all_min(jnp.asarray(pred), jnp.asarray(target))
        )
        assert np.all(j_best <= p_best + 1e-6)  # per-joint oracle is at least as good

    def test_zero_error(self):
        t = np.zeros((B, F, J, 3), dtype=np.float32)
        p = np.zeros((B, K, H, F, J, 3), dtype=np.float32)
        assert float(mpjpe_diffusion(jnp.asarray(p), jnp.asarray(t))[0]) == 0.0

    def test_procrustes_invariance(self, rng):
        # aligned error of a rotated+scaled+shifted copy should be ~0
        from d3dp_tpu.metrics.procrustes import procrustes_align

        x = rng.randn(5, J, 3).astype(np.float32)
        # random rotation via QR
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        y = 1.7 * x @ q.astype(np.float32) + np.float32(0.3)
        aligned = np.asarray(procrustes_align(jnp.asarray(y), jnp.asarray(x)))
        np.testing.assert_allclose(aligned, x, atol=1e-4)
