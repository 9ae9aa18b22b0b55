"""Protocol-2 (P-MPJPE) metrics: rigid alignment via batched SVD.

Unlike the reference — which round-trips every hypothesis through host NumPy
(common/loss.py:190-395) — alignment here is a single batched jnp SVD over
(M, 3, 3) cross-covariances, so the whole Protocol-2 pipeline can stay
on-device (it also works under `jax.jit` on CPU for tests).
"""

import jax.numpy as jnp

_PREC = "highest"  # this JAX build defaults to low-precision matmuls; P2 needs fp32

from d3dp_tpu.metrics.mpjpe import _norm, _wmean, joint_select_by_reproj


def procrustes_align(predicted, target):
    """Optimal similarity transform (scale+rotation+translation) per pose.

    predicted, target: (M, J, 3). Returns predicted_aligned (M, J, 3).
    (reference math: common/loss.py:148-187)
    """
    muX = jnp.mean(target, axis=1, keepdims=True)
    muY = jnp.mean(predicted, axis=1, keepdims=True)

    X0 = target - muX
    Y0 = predicted - muY

    normX = jnp.sqrt(jnp.sum(X0**2, axis=(1, 2), keepdims=True))
    normY = jnp.sqrt(jnp.sum(Y0**2, axis=(1, 2), keepdims=True))

    X0 = X0 / normX
    Y0 = Y0 / normY

    H = jnp.matmul(jnp.swapaxes(X0, 1, 2), Y0, precision=_PREC)
    U, s, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, 1, 2)
    R = jnp.matmul(V, jnp.swapaxes(U, 1, 2), precision=_PREC)

    # Fix improper rotations (reflections): flip the last singular direction
    sign_detR = jnp.sign(jnp.linalg.det(R))[:, None]  # (M,1)
    V = V.at[:, :, -1].multiply(sign_detR)
    s = s.at[:, -1].multiply(sign_detR[:, 0])
    R = jnp.matmul(V, jnp.swapaxes(U, 1, 2), precision=_PREC)

    tr = jnp.sum(s, axis=1, keepdims=True)[:, :, None]  # (M,1,1)

    a = tr * normX / normY  # scale
    t = muX - a * jnp.matmul(muY, R, precision=_PREC)  # translation
    return a * jnp.matmul(predicted, R, precision=_PREC) + t


def p_mpjpe(predicted, target):
    """Scalar Protocol-2 error over (M, J, 3). (loss.py:148-187)"""
    assert predicted.shape == target.shape
    aligned = procrustes_align(predicted, target)
    return jnp.mean(_norm(aligned - target))


def _align_hypotheses(predicted, target, mean_pos):
    """Broadcast target, flatten, align. Returns (aligned, target) both
    shaped (B,K,[H,]F,J,3)."""
    B, K, H, F, J, C = predicted.shape
    if mean_pos:
        predicted = jnp.mean(predicted, axis=2)  # (B,K,F,J,3)
        target_b = jnp.broadcast_to(target[:, None], (B, K, F, J, C))
        flat_shape = (B * K * F, J, C)
        out_shape = (B, K, F, J, C)
    else:
        target_b = jnp.broadcast_to(target[:, None, None], (B, K, H, F, J, C))
        flat_shape = (B * K * H * F, J, C)
        out_shape = (B, K, H, F, J, C)
    aligned = procrustes_align(
        predicted.reshape(flat_shape), target_b.reshape(flat_shape)
    )
    return aligned.reshape(out_shape), target_b


def p_mpjpe_diffusion(predicted, target, mean_pos=False, weights=None):
    """P-Best / P-Agg under Protocol 2, -> (K,). (loss.py:262-331)

    `weights`: optional (B,) 0/1 mask excluding padded windows (fixed-shape
    eval micro-batches), mirroring the Protocol-1 family's contract.
    """
    aligned, target_b = _align_hypotheses(predicted, target, mean_pos)
    errors = _norm(aligned - target_b)
    if not mean_pos:
        per_kh = _wmean(errors, weights, keep_axes=(1, 2))  # (K,H)
        return jnp.min(per_kh, axis=1)
    return _wmean(errors, weights, keep_axes=(1,))


def p_mpjpe_diffusion_all_min(predicted, target, mean_pos=False, weights=None):
    """J-Best / P-Agg under Protocol 2, -> (K,). (loss.py:190-260)"""
    aligned, target_b = _align_hypotheses(predicted, target, mean_pos)
    errors = _norm(aligned - target_b)
    if not mean_pos:
        min_errors = jnp.min(errors, axis=2)  # (B,K,F,J)
        return _wmean(min_errors, weights, keep_axes=(1,))
    return _wmean(errors, weights, keep_axes=(1,))


def p_mpjpe_diffusion_reproj(predicted, target, reproj_2d, target_2d,
                             weights=None):
    """J-Agg / JPMA under Protocol 2, -> (K,). (loss.py:333-395)"""
    aligned, target_b = _align_hypotheses(predicted, target, mean_pos=False)
    errors = _norm(aligned - target_b)  # (B,K,H,F,J)
    errors_2d = _norm(reproj_2d - target_2d[:, None, None])
    onehot = joint_select_by_reproj(errors_2d)
    errors_select = jnp.sum(errors * onehot, axis=2)
    return _wmean(errors_select, weights, keep_axes=(1,))
