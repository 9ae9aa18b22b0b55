"""Windowed multi-hypothesis evaluation with on-device aggregation.

Mirrors the reference evaluate() loop (main.py:596-794): per sequence,
flip the 2D inputs by keypoint symmetry, window to the receptive field,
micro-batch the windows, DDIM-sample (B,K,H,F,J,3) hypothesis stacks, and
score all four aggregation modes (J-Best, P-Best, P-Agg, J-Agg/JPMA) per
micro-batch, accumulating frame-weighted sums.

TPU-first differences:
  * ONE jitted eval step covers sampling + JPMA reprojection + all four P1
    metrics — the hypothesis stack never leaves the device
  * micro-batches are padded to a fixed size with 0/1 window weights, so the
    step compiles once (the reference retraces nothing but pays a ragged
    final batch; XLA would recompile — weights keep the math identical)
  * Protocol-2 (Procrustes) runs on the host numpy backend for bit-parity
    with the reference's numpy SVD path (loss.py:190-395)
"""

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from d3dp_tpu.data.windowing import window_sequence
from d3dp_tpu.geometry.camera import project_to_2d
from d3dp_tpu.metrics.mpjpe import (
    mpjpe_diffusion,
    mpjpe_diffusion_all_min,
    mpjpe_diffusion_reproj,
)
from d3dp_tpu.metrics.procrustes import (
    p_mpjpe_diffusion,
    p_mpjpe_diffusion_all_min,
    p_mpjpe_diffusion_reproj,
)
from d3dp_tpu.metrics.procrustes_np import (
    p_mpjpe_diffusion_np,
    p_mpjpe_diffusion_all_min_np,
    p_mpjpe_diffusion_reproj_np,
)

MODES = ("J_Best", "P_Best", "P_Agg", "J_Agg")


def provider_noise(noise_provider, n, pad, bs):
    """Fetch + zero-pad one micro-batch of replay noise (parity harnesses;
    see `evaluate(noise_provider=...)`). Returns `img0` (bs, H, F, J, 3)
    and `step_noises` (K, bs, H, F, J, 3) — note the step axis LEADS the
    stack, so batch shardings apply to axis 1, not axis 0."""
    img0, step_noises = noise_provider(n)
    if pad:
        z = ((0, pad),) + ((0, 0),) * (img0.ndim - 1)
        img0 = np.pad(img0, z)
        step_noises = np.pad(step_noises, ((0, 0),) + z)
    assert img0.shape[0] == bs and step_noises.shape[1] == bs, (
        f"noise_provider returned {img0.shape}/{step_noises.shape} "
        f"for micro-batch size {bs}")
    return img0, step_noises


@dataclass
class EvalResult:
    """Frame-weighted sums per aggregation mode; (K,) arrays.

    add() does NOT touch the error values — they may be device arrays
    still being computed (converting would force a host sync per
    micro-batch, a full tunnel round-trip on remote TPUs, serialising
    device compute against the host loop). Conversion happens once at
    read time, reproducing the original sequential float64 summation
    order exactly (the whole-pipeline log-text parity depends on it)."""

    pending: list = field(default_factory=list)
    pending_p2: list = field(default_factory=list)
    sums: dict = field(default_factory=dict)
    sums_p2: dict = field(default_factory=dict)
    n: int = 0

    def add(self, errors: dict, errors_p2: Optional[dict], weight: int):
        self.pending.append((errors, weight))
        if errors_p2 is not None:
            self.pending_p2.append((errors_p2, weight))
        self.n += weight

    @staticmethod
    def _reduce(pending, sums):
        """Fold pending entries into sums (host float64, sequential order)
        and release the device buffers — repeated average reads must not
        re-fetch every micro-batch over the device link."""
        for errors, weight in pending:
            for m, v in errors.items():
                e = np.asarray(v, dtype=np.float64) * weight
                sums[m] = sums.get(m, 0.0) + e
        pending.clear()
        return sums

    def averages_mm(self):
        """-> dict mode -> (K,) in millimetres."""
        return {m: v / self.n * 1000.0
                for m, v in self._reduce(self.pending, self.sums).items()}

    def averages_p2_mm(self):
        return {m: v / self.n * 1000.0
                for m, v in self._reduce(self.pending_p2,
                                         self.sums_p2).items()}


class Evaluator:
    def __init__(self, d3dp, receptive_field=243, batch_size=4,
                 kps_left=None, kps_right=None, p2=False, quickdebug=False,
                 light=False, mesh=None, p2_device=False):
        """`light=True` computes only P-Best (no JPMA reprojection) — the
        reference's end-of-epoch validation metric (main.py:455).

        `mesh`: optional jax.sharding.Mesh — eval windows (and the
        hypothesis batch folded into them) shard over its 'dp' axis; the
        jitted step then runs data-parallel with XLA inserting the metric
        reductions' collectives. batch_size must divide by the dp size.

        `p2_device=True` (implies p2): Protocol-2 alignment runs INSIDE the
        jitted eval step as a batched jnp SVD instead of on host numpy —
        the hypothesis stack never leaves the device. Host numpy stays the
        default for bit-parity with the reference's LAPACK path (fp32
        LAPACK vs XLA SVD differ at ~1e-4 mm on ill-conditioned poses)."""
        self.d3dp = d3dp
        self.rf = receptive_field
        self.bs = batch_size
        self.kps_left = kps_left
        self.kps_right = kps_right
        self.p2 = p2 or p2_device
        self.p2_device = p2_device
        self.quickdebug = quickdebug
        self.light = light
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from d3dp_tpu.parallel import batch_sharding

            assert batch_size % mesh.shape["dp"] == 0, (
                f"batch_size {batch_size} not divisible by dp={mesh.shape['dp']}")
            self._batch_sharding = batch_sharding(mesh)
            from d3dp_tpu.parallel import step_noise_sharding

            self._noise_sharding = step_noise_sharding(mesh)
        self._step = jax.jit(self._eval_step, static_argnames=("need_preds",))
        self._step_noise = jax.jit(
            self._eval_step_noise, static_argnames=("need_preds",))

    # ------------------------------------------------------------------
    def _eval_step(self, params, key, x2d, x2d_flip, x3d, traj, cam, weights,
                   need_preds=False):
        """One micro-batch: sample + root-zero + JPMA + 4 P1 metrics.

        x2d/x2d_flip: (B,F,J,2), x3d: (B,F,J,3) root-zeroed target,
        traj: (B,F,1,3), cam: (B,9), weights: (B,) 0/1.
        """
        preds = self.d3dp.sample(params, key, x2d, x2d_flip)  # (B,K,H,F,J,3)
        return self._score(preds, x2d, x3d, traj, cam, weights, need_preds)

    def _eval_step_noise(self, params, key, x2d, x2d_flip, x3d, traj, cam,
                         weights, img0, noises, need_preds=False):
        """Noise-injected variant of _eval_step: the DDIM draws are replaced
        by (img0, noises) — used by the whole-pipeline parity harness to
        replay the reference's exact torch RNG stream."""
        preds = self.d3dp.sample(params, key, x2d, x2d_flip,
                                 noise_override=(img0, noises))
        return self._score(preds, x2d, x3d, traj, cam, weights, need_preds)

    def _score(self, preds, x2d, x3d, traj, cam, weights, need_preds):
        preds = preds.at[..., 0, :].set(0.0)  # zero root (main.py:700)

        if self.light:
            errors = {"P_Best": mpjpe_diffusion(preds, x3d, weights=weights)}
            return errors, None, None

        B, K, H, F, J, _ = preds.shape
        # JPMA: absolute poses -> 2D reprojection (main.py:705-712)
        pred_abs = preds + traj[:, None, None]
        reproj = project_to_2d(
            pred_abs.reshape(B, K * H * F * J, 3), cam
        ).reshape(B, K, H, F, J, 2)

        errors = {
            "J_Best": mpjpe_diffusion_all_min(preds, x3d, weights=weights),
            "P_Best": mpjpe_diffusion(preds, x3d, weights=weights),
            "P_Agg": mpjpe_diffusion_all_min(
                preds, x3d, mean_pos=True, weights=weights
            ),
            "J_Agg": mpjpe_diffusion_reproj(
                preds, x3d, reproj, x2d, weights=weights
            ),
        }
        errors_p2 = None
        if self.p2_device:
            # Protocol-2 stays on device: batched jnp SVD alignment
            # (reference math loss.py:148-395, host round-trip removed)
            errors_p2 = {
                "J_Best": p_mpjpe_diffusion_all_min(preds, x3d,
                                                    weights=weights),
                "P_Best": p_mpjpe_diffusion(preds, x3d, weights=weights),
                "P_Agg": p_mpjpe_diffusion_all_min(
                    preds, x3d, mean_pos=True, weights=weights),
                "J_Agg": p_mpjpe_diffusion_reproj(
                    preds, x3d, reproj, x2d, weights=weights),
            }
        if need_preds:
            return errors, errors_p2, preds
        return errors, errors_p2, None

    # ------------------------------------------------------------------
    def evaluate(self, params, generator, key, return_predictions=False,
                 noise_provider=None):
        """Run the full eval loop over an UnchunkedGenerator.

        Returns EvalResult — or, with return_predictions, the raw
        prediction stack (W, K, H, F, J, 3) of ALL windows of the first
        sequence (the reference's --render path returns only the first
        micro-batch, main.py:702-703, leaving garbage frames when a sequence
        has more windows than the batch size).

        `noise_provider(n)` (optional): called once per micro-batch with the
        number of REAL (unpadded) windows; must return (img0, step_noises)
        of shapes (n,H,F,J,3) and (K,n,H,F,J,3) which replace the sampler's
        random draws (pad rows get zeros — their outputs carry weight 0).
        Used to replay the reference's torch RNG stream end-to-end.
        """
        result = EvalResult()
        rf, bs = self.rf, self.bs

        def prep():
            """Host-side per-sequence prep: flip + windowing. Runs in a
            Prefetcher worker thread so sequence i+1's numpy work overlaps
            sequence i's device compute."""
            kl, kr = self.kps_left, self.kps_right
            for item in generator.next_epoch():
                cam, batch_3d, batch_2d = item[:3]
                seq_2d = np.asarray(batch_2d[0], dtype=np.float32)
                if batch_3d is None:
                    # unlabeled sequence (--render without GT): sample
                    # against a zero target; only predictions matter
                    seq_3d = np.zeros(seq_2d.shape[:2] + (3,), np.float32)
                else:
                    seq_3d = np.asarray(batch_3d[0], dtype=np.float32)
                cam_vec = np.asarray(cam[0], dtype=np.float32)

                # keypoint-symmetry flip of the conditioning
                # (main.py:645-648)
                seq_2d_flip = seq_2d.copy()
                seq_2d_flip[..., 0] *= -1
                seq_2d_flip[:, kl + kr] = seq_2d_flip[:, kr + kl]

                w2d = window_sequence(seq_2d, rf)
                w2d_f = window_sequence(seq_2d_flip, rf)
                w3d = window_sequence(seq_3d, rf)

                traj = w3d[:, :, :1].copy()
                w3d = w3d.copy()
                w3d[:, :, 0] = 0.0  # root-zero target (main.py:679-680)
                yield cam_vec, w2d, w2d_f, w3d, traj

        from d3dp_tpu.data.prefetch import Prefetcher

        for cam_vec, w2d, w2d_f, w3d, traj in Prefetcher(prep(), depth=2):
            W = w2d.shape[0]
            n_batches = (W + bs - 1) // bs
            pred_parts = []
            for b in range(n_batches):
                lo, hi = b * bs, min((b + 1) * bs, W)
                n = hi - lo
                pad = bs - n

                def put(x):
                    if self._batch_sharding is not None:
                        from d3dp_tpu.parallel import put_global

                        return put_global(x, self._batch_sharding)
                    return jnp.asarray(x)

                def take(a):
                    x = a[lo:hi]
                    if pad:
                        x = np.concatenate([x, np.repeat(x[:1], pad, 0)], 0)
                    return put(x)

                weights = put(
                    np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)
                )
                cams = put(np.tile(cam_vec, (bs, 1)))

                key, sub = jax.random.split(key)
                need_preds = return_predictions or (
                    self.p2 and not self.p2_device)
                if noise_provider is None:
                    errors, errors_p2_dev, preds = self._step(
                        params, sub, take(w2d), take(w2d_f), take(w3d),
                        take(traj), cams, weights, need_preds=need_preds,
                    )
                else:
                    img0, step_noises = provider_noise(
                        noise_provider, n, pad, bs)
                    if self._batch_sharding is not None:
                        step_noises = jax.device_put(
                            step_noises, self._noise_sharding)
                    errors, errors_p2_dev, preds = self._step_noise(
                        params, sub, take(w2d), take(w2d_f), take(w3d),
                        take(traj), cams, weights, put(img0),
                        jnp.asarray(step_noises), need_preds=need_preds,
                    )
                if return_predictions:
                    # collect ALL windows of the first sequence (the
                    # reference returns only the first micro-batch,
                    # main.py:702-703 — garbage frames when windows > bs)
                    pred_parts.append(np.asarray(preds)[:n])
                    if b == n_batches - 1:
                        return np.concatenate(pred_parts, axis=0)
                    continue

                errors_p2 = None
                if self.p2_device:
                    # device error vectors, deferred like the P1 dict
                    errors_p2 = errors_p2_dev
                elif self.p2:
                    # host slices, not np.asarray(take(...))[:n]: the
                    # unpadded rows are bit-identical and already in RAM —
                    # the device round-trip costs 3 tunnel transfers per
                    # micro-batch for nothing
                    errors_p2 = self._p2_host(
                        np.asarray(preds)[:n],
                        w3d[lo:hi],
                        w2d[lo:hi],
                        cam_vec,
                        traj[lo:hi],
                    )
                result.add(errors, errors_p2, weight=n * rf)
                # backpressure: error vectors stay on device (no per-batch
                # sync), but an unbounded dispatch queue would let the host
                # race arbitrarily far ahead — one sync every 16 batches
                # drains it (device execution is in-order)
                self._dispatched = getattr(self, "_dispatched", 0) + 1
                if self._dispatched % 16 == 0:
                    _ = float(jnp.sum(errors["P_Best"]))

                if self.quickdebug:
                    return result
            if self.quickdebug:
                return result
        return result

    # ------------------------------------------------------------------
    def _p2_host(self, preds, x3d, x2d, cam_vec, traj):
        """Protocol-2 on host numpy (exact reference parity)."""
        B, K, H, F, J, _ = preds.shape
        pred_abs = preds + traj[:, None, None]
        reproj = np.asarray(
            project_to_2d(
                jnp.asarray(pred_abs.reshape(B, K * H * F * J, 3)),
                jnp.asarray(np.tile(cam_vec, (B, 1))),
            )
        ).reshape(B, K, H, F, J, 2)
        return {
            "J_Best": p_mpjpe_diffusion_all_min_np(preds, x3d),
            "P_Best": p_mpjpe_diffusion_np(preds, x3d),
            "P_Agg": p_mpjpe_diffusion_all_min_np(preds, x3d, mean_pos=True),
            "J_Agg": p_mpjpe_diffusion_reproj_np(preds, x3d, reproj, x2d),
        }
