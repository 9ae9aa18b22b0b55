"""Host (NumPy/LAPACK) backend for the Protocol-2 metric family.

Same math as d3dp_tpu.metrics.procrustes but on numpy — used when reported
numbers must match the reference bit-for-bit (the reference computes P2 on
host numpy, common/loss.py:190-395; fp32 LAPACK vs fp32 XLA SVD differ at
~1e-4 on ill-conditioned poses). The evaluator calls these for final P2
reporting; the jnp versions remain available for fully on-device pipelines.
"""

import numpy as np


def procrustes_align_np(predicted, target):
    """Batched similarity alignment; predicted/target: (M, J, 3) numpy."""
    muX = np.mean(target, axis=1, keepdims=True)
    muY = np.mean(predicted, axis=1, keepdims=True)

    X0 = target - muX
    Y0 = predicted - muY

    normX = np.sqrt(np.sum(X0**2, axis=(1, 2), keepdims=True))
    normY = np.sqrt(np.sum(Y0**2, axis=(1, 2), keepdims=True))

    X0 = X0 / normX
    Y0 = Y0 / normY

    H = np.matmul(X0.transpose(0, 2, 1), Y0)
    U, s, Vt = np.linalg.svd(H)
    V = Vt.transpose(0, 2, 1)
    R = np.matmul(V, U.transpose(0, 2, 1))

    sign_detR = np.sign(np.expand_dims(np.linalg.det(R), axis=1))
    V[:, :, -1] *= sign_detR
    s[:, -1] *= sign_detR.flatten()
    R = np.matmul(V, U.transpose(0, 2, 1))

    tr = np.expand_dims(np.sum(s, axis=1, keepdims=True), axis=2)
    a = tr * normX / normY
    t = muX - a * np.matmul(muY, R)
    return a * np.matmul(predicted, R) + t


def _norm(x, axis=-1):
    return np.linalg.norm(x, axis=axis)


def _align_hypotheses_np(predicted, target, mean_pos):
    B, K, H, F, J, C = predicted.shape
    if mean_pos:
        predicted = np.mean(predicted, axis=2)
        target_b = np.broadcast_to(target[:, None], (B, K, F, J, C))
        flat = (B * K * F, J, C)
        out = (B, K, F, J, C)
    else:
        target_b = np.broadcast_to(target[:, None, None], (B, K, H, F, J, C))
        flat = (B * K * H * F, J, C)
        out = (B, K, H, F, J, C)
    aligned = procrustes_align_np(
        np.ascontiguousarray(predicted.reshape(flat)),
        np.ascontiguousarray(target_b.reshape(flat)),
    )
    return aligned.reshape(out), target_b


def p_mpjpe_np(predicted, target):
    aligned = procrustes_align_np(predicted, target)
    return np.mean(_norm(aligned - target))


def p_mpjpe_diffusion_np(predicted, target, mean_pos=False):
    aligned, target_b = _align_hypotheses_np(predicted, target, mean_pos)
    errors = _norm(aligned - target_b)
    if not mean_pos:
        per_kh = np.mean(errors, axis=(0, 3, 4))
        return np.min(per_kh, axis=1)
    return np.mean(errors, axis=(0, 2, 3))


def p_mpjpe_diffusion_all_min_np(predicted, target, mean_pos=False):
    aligned, target_b = _align_hypotheses_np(predicted, target, mean_pos)
    errors = _norm(aligned - target_b)
    if not mean_pos:
        return np.mean(np.min(errors, axis=2), axis=(0, 2, 3))
    return np.mean(errors, axis=(0, 2, 3))


def p_mpjpe_diffusion_reproj_np(predicted, target, reproj_2d, target_2d):
    aligned, target_b = _align_hypotheses_np(predicted, target, mean_pos=False)
    errors = _norm(aligned - target_b)  # (B,K,H,F,J)
    errors_2d = _norm(reproj_2d - target_2d[:, None, None])
    idx = np.argmin(errors_2d, axis=2)  # (B,K,F,J)
    errors_select = np.take_along_axis(errors, idx[:, :, None], axis=2)[:, :, 0]
    return np.mean(errors_select, axis=(0, 2, 3))
