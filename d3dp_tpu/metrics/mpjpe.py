"""Protocol-1 (MPJPE) metric family over multi-hypothesis diffusion output.

All functions are pure jnp and jit-safe: they run on-device, on the full
(B, K, H, F, J, 3) hypothesis stack, and return per-DDIM-step vectors of
shape (K,). Layout convention matches the reference (common/loss.py):

  predicted: (B, K, H, F, J, 3)  — K DDIM steps, H hypotheses
  target:    (B, F, J, 3)

Aggregation modes:
  * P-Best (`mpjpe_diffusion`)            — best whole pose over H
  * P-Agg  (`mean_pos=True` variants)     — mean pose over H
  * J-Best (`mpjpe_diffusion_all_min`)    — per-joint oracle min over H
  * J-Agg  (`mpjpe_diffusion_reproj`)     — per-joint selection by 2D
    reprojection error (JPMA), computed with a one-hot contraction instead of
    the reference's torch.gather so it lowers to MXU-friendly ops.
"""

import jax.numpy as jnp
import jax.nn


def _norm(x, axis=-1):
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axis))


def mpjpe(predicted, target, return_joints_err=False):
    """Mean per-joint position error (training loss). (loss.py:6-20)"""
    assert predicted.shape == target.shape
    errors = _norm(predicted - target)
    if return_joints_err:
        # per-joint mean over batch*time, in mm
        per_joint = jnp.mean(errors.reshape(-1, errors.shape[-1]), axis=0) * 1000
        return jnp.mean(errors), per_joint
    return jnp.mean(errors)


def _wmean(errors, weights, keep_axes):
    """Mean of `errors` over all axes except `keep_axes`, with optional (B,)
    0/1 `weights` masking padded rows of axis 0 (fixed-shape eval batches)."""
    reduce_axes = tuple(a for a in range(errors.ndim) if a not in keep_axes)
    if weights is None:
        return jnp.mean(errors, axis=reduce_axes)
    w = weights.reshape((-1,) + (1,) * (errors.ndim - 1)).astype(errors.dtype)
    n_other = 1
    for a in reduce_axes:
        if a != 0:
            n_other *= errors.shape[a]
    return jnp.sum(errors * w, axis=reduce_axes) / (jnp.sum(weights) * n_other)


def mpjpe_diffusion(predicted, target, mean_pos=False, weights=None):
    """P-Best (default) or P-Agg (mean_pos) MPJPE, -> (K,). (loss.py:78-107)

    `weights`: optional (B,) 0/1 mask excluding padded windows from the mean
    (our eval pads micro-batches to a fixed shape for XLA).
    """
    if not mean_pos:
        errors = _norm(predicted - target[:, None, None])  # (B,K,H,F,J)
        per_kh = _wmean(errors, weights, keep_axes=(1, 2))  # (K,H)
        return jnp.min(per_kh, axis=1)
    mean_pose = jnp.mean(predicted, axis=2)  # (B,K,F,J,3)
    errors = _norm(mean_pose - target[:, None])  # (B,K,F,J)
    return _wmean(errors, weights, keep_axes=(1,))


def mpjpe_diffusion_all_min(predicted, target, mean_pos=False, weights=None):
    """J-Best (per-joint oracle over H) or P-Agg, -> (K,). (loss.py:22-52)"""
    if not mean_pos:
        errors = _norm(predicted - target[:, None, None])  # (B,K,H,F,J)
        min_errors = jnp.min(errors, axis=2)  # (B,K,F,J)
        return _wmean(min_errors, weights, keep_axes=(1,))
    return mpjpe_diffusion(predicted, target, mean_pos=True, weights=weights)


def joint_select_by_reproj(errors_2d):
    """One-hot selector over H minimising 2D reprojection error.

    errors_2d: (B,K,H,F,J) -> one-hot (B,K,H,F,J) with a single 1 along H
    (ties resolved to the lowest index, like torch.min).
    """
    idx = jnp.argmin(errors_2d, axis=2)  # (B,K,F,J)
    return jax.nn.one_hot(idx, errors_2d.shape[2], axis=2, dtype=errors_2d.dtype)


def mpjpe_diffusion_reproj(predicted, target, reproj_2d, target_2d, weights=None):
    """J-Agg / JPMA: per-joint hypothesis by 2D reprojection, -> (K,).

    reproj_2d: (B,K,H,F,J,2) projections of hypotheses; target_2d: (B,F,J,2).
    (reference: common/loss.py:54-76)
    """
    errors = _norm(predicted - target[:, None, None])  # (B,K,H,F,J)
    errors_2d = _norm(reproj_2d - target_2d[:, None, None])  # (B,K,H,F,J)
    onehot = joint_select_by_reproj(errors_2d)
    errors_select = jnp.sum(errors * onehot, axis=2)  # (B,K,F,J)
    return _wmean(errors_select, weights, keep_axes=(1,))


def mpjpe_diffusion_3dhp(predicted, target, valid_frame, mean_pos=False):
    """Valid-frame-masked MPJPE for MPI-INF-3DHP, -> (K,).

    valid_frame: (B, F) float/bool mask — masked mean instead of the
    reference's boolean indexing so the whole thing stays jit-able.
    (reference: common/loss.py:109-145)
    """
    mask = valid_frame.astype(predicted.dtype)  # (B,F)
    B, K, H, F, J, _ = predicted.shape
    denom = jnp.sum(mask) * J

    if not mean_pos:
        errors = _norm(predicted - target[:, None, None])  # (B,K,H,F,J)
        errors = errors * mask[:, None, None, :, None]
        per_kh = jnp.sum(errors, axis=(0, 3, 4)) / denom  # (K,H)
        return jnp.min(per_kh, axis=1)
    mean_pose = jnp.mean(predicted, axis=2)
    errors = _norm(mean_pose - target[:, None]) * mask[:, None, :, None]
    return jnp.sum(errors, axis=(0, 2, 3)) / denom


def n_mpjpe(predicted, target):
    """Normalised MPJPE (optimal scale). (loss.py:398-408)"""
    assert predicted.shape == target.shape
    norm_predicted = jnp.mean(
        jnp.sum(predicted**2, axis=3, keepdims=True), axis=2, keepdims=True
    )
    norm_target = jnp.mean(
        jnp.sum(target * predicted, axis=3, keepdims=True), axis=2, keepdims=True
    )
    scale = norm_target / norm_predicted
    return mpjpe(scale * predicted, target)


def mean_velocity_error_train(predicted, target, axis=1):
    """Mean per-joint velocity error along the frame axis. (loss.py:411-423)"""
    assert predicted.shape == target.shape
    vel_p = jnp.diff(predicted, axis=axis)
    vel_t = jnp.diff(target, axis=axis)
    return jnp.mean(_norm(vel_p - vel_t))


def mean_velocity_error(predicted, target, axis=0):
    """Numpy-convention variant (same math). (loss.py:425-434)"""
    return mean_velocity_error_train(predicted, target, axis=axis)
