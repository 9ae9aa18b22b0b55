"""Geometry parity vs the PyTorch reference (fp32)."""

import numpy as np
import pytest
import jax.numpy as jnp

from d3dp_tpu.geometry import (
    qrot,
    qinverse,
    normalize_screen_coordinates,
    image_coordinates,
    world_to_camera,
    camera_to_world,
    project_to_2d,
    project_to_2d_linear,
    uvd2xyz,
)
from tests.reference_oracle import reference_available, import_reference

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


def random_unit_quats(rng, shape):
    q = rng.randn(*shape, 4).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def random_cams(rng, n):
    """Plausible normalised H36M-style intrinsics (f, c, k1-3, p1-2)."""
    cam = np.zeros((n, 9), dtype=np.float32)
    cam[:, 0:2] = 2.2 + 0.1 * rng.rand(n, 2)
    cam[:, 2:4] = 0.02 * rng.randn(n, 2)
    cam[:, 4:7] = 0.1 * rng.randn(n, 3)
    cam[:, 7:9] = 0.01 * rng.randn(n, 2)
    return cam


class TestQuaternion:
    def test_qrot_preserves_norm(self, rng):
        q = random_unit_quats(rng, (64,))
        v = rng.randn(64, 3).astype(np.float32)
        out = np.asarray(qrot(jnp.asarray(q), jnp.asarray(v)))
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-5
        )

    def test_qinverse_roundtrip(self, rng):
        q = random_unit_quats(rng, (32,))
        v = rng.randn(32, 3).astype(np.float32)
        out = qrot(jnp.asarray(qinverse(jnp.asarray(q))), qrot(jnp.asarray(q), jnp.asarray(v)))
        np.testing.assert_allclose(np.asarray(out), v, atol=1e-5)

    @needs_ref
    def test_qrot_parity(self, rng):
        import torch

        ref_q = import_reference("common.quaternion")
        q = random_unit_quats(rng, (16, 5))
        v = rng.randn(16, 5, 3).astype(np.float32)
        expected = ref_q.qrot(torch.from_numpy(q), torch.from_numpy(v)).numpy()
        got = np.asarray(qrot(jnp.asarray(q), jnp.asarray(v)))
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestScreenCoords:
    def test_roundtrip(self, rng):
        X = (rng.rand(10, 17, 2) * 1000).astype(np.float32)
        n = normalize_screen_coordinates(X, w=1000, h=1002)
        back = image_coordinates(n, w=1000, h=1002)
        np.testing.assert_allclose(back, X, atol=1e-3)

    @needs_ref
    def test_parity(self, rng):
        ref_cam = import_reference("common.camera")
        X = (rng.rand(7, 17, 2) * 1000).astype(np.float32)
        expected = ref_cam.normalize_screen_coordinates(X.copy(), w=1000, h=1002)
        got = normalize_screen_coordinates(X, w=1000, h=1002)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


class TestWorldCamera:
    def test_roundtrip(self, rng):
        q = random_unit_quats(rng, ())
        t = rng.randn(3).astype(np.float32)
        X = rng.randn(50, 17, 3).astype(np.float32)
        cam = world_to_camera(jnp.asarray(X), q, t)
        back = camera_to_world(cam, q, t)
        np.testing.assert_allclose(np.asarray(back), X, atol=1e-4)

    @needs_ref
    def test_parity(self, rng):
        ref_cam = import_reference("common.camera")
        q = random_unit_quats(rng, ())
        t = rng.randn(3).astype(np.float32)
        X = rng.randn(20, 17, 3).astype(np.float32)
        expected = ref_cam.world_to_camera(X, R=q, t=t)
        got = np.asarray(world_to_camera(jnp.asarray(X), q, t))
        np.testing.assert_allclose(got, expected, atol=1e-5)
        expected_b = ref_cam.camera_to_world(expected, R=q, t=t)
        got_b = np.asarray(camera_to_world(jnp.asarray(got), q, t))
        np.testing.assert_allclose(got_b, expected_b, atol=1e-5)


class TestProjection:
    @needs_ref
    def test_project_to_2d_parity(self, rng):
        import torch

        ref_cam = import_reference("common.camera")
        X = rng.randn(8, 243, 17, 3).astype(np.float32)
        X[..., 2] += 5.0  # keep points in front of the camera
        cams = random_cams(rng, 8)
        expected = ref_cam.project_to_2d(
            torch.from_numpy(X), torch.from_numpy(cams)
        ).numpy()
        got = np.asarray(project_to_2d(jnp.asarray(X), jnp.asarray(cams)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    @needs_ref
    def test_project_to_2d_linear_parity(self, rng):
        import torch

        ref_cam = import_reference("common.camera")
        X = rng.randn(4, 17, 3).astype(np.float32)
        X[..., 2] += 5.0
        cams = random_cams(rng, 4)
        expected = ref_cam.project_to_2d_linear(
            torch.from_numpy(X), torch.from_numpy(cams)
        ).numpy()
        got = np.asarray(project_to_2d_linear(jnp.asarray(X), jnp.asarray(cams)))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    @needs_ref
    def test_uvd2xyz_parity(self, rng):
        import torch

        ref_cam = import_reference("common.camera")
        uvd = rng.randn(3, 9, 17, 3).astype(np.float32)
        gt = rng.randn(3, 9, 17, 3).astype(np.float32)
        gt[..., 2] += 6.0
        cams = random_cams(rng, 3)
        expected = ref_cam.uvd2xyz(
            torch.from_numpy(uvd.copy()), torch.from_numpy(gt.copy()), torch.from_numpy(cams)
        ).numpy()
        got = np.asarray(uvd2xyz(jnp.asarray(uvd), jnp.asarray(gt), jnp.asarray(cams)))
        np.testing.assert_allclose(got, expected, atol=1e-5)
