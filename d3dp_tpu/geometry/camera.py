"""Camera model: screen normalisation, world<->camera transforms, and the
full Human3.6M projection (radial k1-k3 + tangential distortion).

Capability parity with the reference (common/camera.py:7-114) but pure
jax.numpy: differentiable, batched, broadcasting, and jit/vmap friendly.
``project_to_2d`` is the core of JPMA (J-Agg) hypothesis selection and runs
on-device inside the evaluation graph.
"""

import numpy as np
import jax.numpy as jnp

from d3dp_tpu.geometry.quaternion import qrot, qinverse


def normalize_screen_coordinates(X, w, h):
    """Map pixel coords so [0, w] -> [-1, 1], preserving aspect ratio.

    Works on numpy or jax arrays; shape (..., 2).
    (reference: common/camera.py:7-11)
    """
    assert X.shape[-1] == 2
    if isinstance(X, np.ndarray):
        # float64 offset, like the reference's bare Python list — callers
        # downcast afterwards; doing it here loses the last fp32 ulp
        return X / w * 2 - np.array([1, h / w])
    return X / w * 2 - jnp.asarray([1.0, h / w], dtype=X.dtype)


def image_coordinates(X, w, h):
    """Inverse of :func:`normalize_screen_coordinates`. (camera.py:14-18)"""
    assert X.shape[-1] == 2
    if isinstance(X, np.ndarray):
        return (X + np.array([1, h / w])) * w / 2
    return (X + jnp.asarray([1.0, h / w], dtype=X.dtype)) * w / 2


def world_to_camera(X, R, t):
    """World -> camera frame. X: (..., 3); R: (4,) quaternion; t: (3,).

    (reference: common/camera.py:21-23)
    """
    Rt = qinverse(jnp.asarray(R, dtype=jnp.float32))
    Rt = jnp.broadcast_to(Rt, X.shape[:-1] + (4,))
    return qrot(Rt, jnp.asarray(X) - jnp.asarray(t, dtype=jnp.float32))


def camera_to_world(X, R, t):
    """Camera -> world frame. (reference: common/camera.py:26-27)"""
    R = jnp.asarray(R, dtype=jnp.float32)
    Rq = jnp.broadcast_to(R, X.shape[:-1] + (4,))
    return qrot(Rq, jnp.asarray(X)) + jnp.asarray(t, dtype=jnp.float32)


def _broadcast_cam(camera_params, X_ndim):
    """Insert middle axes so (N, 9) broadcasts against (N, ..., 3)."""
    while camera_params.ndim < X_ndim:
        camera_params = camera_params[:, None]
    return camera_params


def project_to_2d(X, camera_params):
    """Project camera-space 3D points to 2D with H36M distortion.

    X: (N, ..., 3) camera-space points.
    camera_params: (N, 9) = focal(2) + center(2) + radial k1-3(3) + tangential(2).
    Returns (N, ..., 2). Differentiable; used on-device for JPMA.
    (reference: common/camera.py:30-60)
    """
    assert X.shape[-1] == 3
    assert camera_params.ndim == 2
    assert camera_params.shape[-1] == 9
    assert X.shape[0] == camera_params.shape[0]

    camera_params = _broadcast_cam(camera_params, X.ndim)

    f = camera_params[..., :2]
    c = camera_params[..., 2:4]
    k = camera_params[..., 4:7]
    p = camera_params[..., 7:]

    XX = jnp.clip(X[..., :2] / X[..., 2:], -1.0, 1.0)
    r2 = jnp.sum(XX**2, axis=-1, keepdims=True)

    radial = 1 + jnp.sum(
        k * jnp.concatenate((r2, r2**2, r2**3), axis=-1), axis=-1, keepdims=True
    )
    tan = jnp.sum(p * XX, axis=-1, keepdims=True)

    XXX = XX * (radial + tan) + p * r2
    return f * XXX + c


def project_to_2d_linear(X, camera_params):
    """Pinhole-only projection (focal + center). (camera.py:62-83)"""
    assert X.shape[-1] == 3
    assert camera_params.ndim == 2
    assert camera_params.shape[-1] == 9
    assert X.shape[0] == camera_params.shape[0]

    camera_params = _broadcast_cam(camera_params, X.ndim)
    f = camera_params[..., :2]
    c = camera_params[..., 2:4]
    XX = jnp.clip(X[..., :2] / X[..., 2:], -1.0, 1.0)
    return f * XX + c


def uvd2xyz(uvd, gt_3d, cam):
    """Lift uv+depth to root-relative xyz. uvd/gt_3d: (N, T, V, 3); cam: (N, 9).

    Joint 0's depth is taken from the ground-truth root.
    (reference: common/camera.py:85-114)
    """
    N, T, V, _ = uvd.shape
    root = gt_3d[:, :, :1, :]  # (N, T, 1, 3) — absolute root; its depth anchors all joints

    z_root = root[..., 2:]
    z_rest = uvd[:, :, 1:, 2:] + z_root  # per-joint depth offsets + root depth
    z_global = jnp.concatenate([z_root, z_rest], axis=2)

    cam_f = cam[..., :2].reshape(N, 1, 1, 2)
    cam_c = cam[..., 2:4].reshape(N, 1, 1, 2)

    uv = uvd[..., :2] - cam_c
    xy = uv * z_global / cam_f
    xyz_global = jnp.concatenate((xy, z_global), axis=-1)
    return xyz_global - xyz_global[:, :, :1, :]
