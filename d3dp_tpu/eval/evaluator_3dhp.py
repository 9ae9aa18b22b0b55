"""MPI-INF-3DHP evaluation: valid-frame-masked metrics + pose-selection
exports for the PCK/AUC harness.

Mirrors the reference evaluate() in main_3dhp.py:659-912: per test sequence
TS1..TS6, window to the receptive field (windowing valid-frame masks too),
micro-batch, DDIM-sample, select poses per aggregation mode (P-Agg mean,
P-Best global-per-step, J-Best oracle, J-Agg pixel-space reprojection with
per-TS intrinsics), stitch windows back, export inference_data_<mode>.mat.

TPU-first: sampling + selection + masked metrics in ONE jitted step per
micro-batch; padded windows carry zeroed valid masks so shapes stay static.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from d3dp_tpu.data.windowing import window_sequence, stitch_windows
from d3dp_tpu.data.mpi3dhp import (
    camera_for_sequence,
    uses_distortion_projection,
    ROOT_JOINT,
    KPS_LEFT,
    KPS_RIGHT,
)
from d3dp_tpu.geometry.camera import (
    project_to_2d,
    project_to_2d_linear,
    image_coordinates,
)
from d3dp_tpu.eval.evaluator import provider_noise
from d3dp_tpu.metrics.mpjpe import mpjpe_diffusion_3dhp
from d3dp_tpu.eval.aggregation import (
    select_p_agg,
    select_p_best,
    select_j_best,
    select_j_agg,
)

MODES = ("P_Agg", "P_Best", "J_Best", "J_Agg")


class Evaluator3DHP:
    def __init__(self, d3dp, receptive_field=243, batch_size=2,
                 quickdebug=False, mesh=None):
        """`mesh`: optional jax.sharding.Mesh — micro-batches shard over its
        'dp' axis (batch_size must divide by dp)."""
        self.d3dp = d3dp
        self.rf = receptive_field
        self.bs = batch_size
        self.quickdebug = quickdebug
        self._batch_sharding = None
        if mesh is not None:
            from d3dp_tpu.parallel import batch_sharding, step_noise_sharding

            assert batch_size % mesh.shape["dp"] == 0
            self._batch_sharding = batch_sharding(mesh)
            self._noise_sharding = step_noise_sharding(mesh)
        self._step = jax.jit(
            self._eval_step, static_argnames=("distortion", "width", "height"))
        self._step_noise = jax.jit(
            self._eval_step_noise,
            static_argnames=("distortion", "width", "height"))

    def _eval_step_noise(self, params, key, x2d, x2d_flip, x3d, traj, valid,
                         win_weights, cam, img0, noises,
                         distortion=False, width=2048, height=2048):
        """Noise-injected _eval_step (whole-pipeline parity harness)."""
        return self._eval_step(
            params, key, x2d, x2d_flip, x3d, traj, valid, win_weights, cam,
            distortion=distortion, width=width, height=height,
            noise_override=(img0, noises))

    def _eval_step(self, params, key, x2d, x2d_flip, x3d, traj, valid,
                   win_weights, cam,
                   distortion=False, width=2048, height=2048,
                   noise_override=None):
        """One micro-batch. x3d root(14)-zeroed target in mm; traj (B,F,1,3);
        valid (B,F) 0/1 incl. padded-window zeros; cam (9,) pixel intrinsics.
        Returns masked (K,) P_Best/P_Agg errors + the 4 selected pose stacks
        (B,K,F,J,3). (main_3dhp.py:772-860)
        """
        preds = self.d3dp.sample(params, key, x2d, x2d_flip,
                                 noise_override=noise_override)  # (B,K,H,F,J,3) mm
        preds = preds.at[..., ROOT_JOINT, :].set(0.0)

        B, K, H, F, J, _ = preds.shape
        errors = {
            "P_Best": mpjpe_diffusion_3dhp(preds, x3d, valid),
            "P_Agg": mpjpe_diffusion_3dhp(preds, x3d, valid, mean_pos=True),
        }

        # JPMA in pixel space with per-TS camera (main_3dhp.py:806-835)
        pred_abs = preds + traj[:, None, None]
        cams = jnp.broadcast_to(cam, (B, 9))
        proj = project_to_2d if distortion else project_to_2d_linear
        reproj = proj(pred_abs.reshape(B, K * H * F * J, 3), cams).reshape(
            B, K, H, F, J, 2)
        target_2d = image_coordinates(x2d[..., :2], w=width, h=height)

        selections = {
            "P_Agg": select_p_agg(preds),
            "P_Best": select_p_best(preds, x3d, weights=win_weights),
            "J_Best": select_j_best(preds, x3d),
            "J_Agg": select_j_agg(preds, reproj, target_2d),
        }
        return errors, selections

    def evaluate(self, params, generator, key, export_dir=None,
                 noise_provider=None):
        """Full loop over an UnchunkedGenerator with valid_frames/keys.

        Returns (per-mode (K,) cumulative masked errors in mm,
        {mode: {TS: (3,J,Ftot,K)}} exports). Writes the four
        inference_data_<mode>.mat when export_dir is given
        (main_3dhp.py:903-912).

        `noise_provider(n)` (optional): per micro-batch noise replay — see
        Evaluator.evaluate; used by tests/test_pipeline_parity_3dhp.py.
        """
        sums = {"P_Best": 0.0, "P_Agg": 0.0}
        N = 0
        exports = {m: {} for m in MODES}

        for _, batch_3d, batch_2d, valid_seq, seq_key in generator.next_epoch():
            seq_2d = np.asarray(batch_2d[0], np.float32)
            seq_3d = np.asarray(batch_3d[0], np.float32)
            valid_seq = np.asarray(valid_seq, np.float32).ravel()

            seq_2d_flip = seq_2d.copy()
            seq_2d_flip[..., 0] *= -1
            seq_2d_flip[:, KPS_LEFT + KPS_RIGHT] = seq_2d_flip[
                :, KPS_RIGHT + KPS_LEFT]

            w2d = window_sequence(seq_2d, self.rf)
            w2d_f = window_sequence(seq_2d_flip, self.rf)
            w3d = window_sequence(seq_3d, self.rf)
            wv = window_sequence(valid_seq, self.rf)

            traj = w3d[:, :, ROOT_JOINT : ROOT_JOINT + 1].copy()
            w3d = w3d.copy()
            w3d[:, :, ROOT_JOINT] = 0.0

            cam, (width, height) = camera_for_sequence(seq_key)
            distortion = uses_distortion_projection(seq_key)

            W = w2d.shape[0]
            sel_parts = {m: [] for m in MODES}
            n_batches = (W + self.bs - 1) // self.bs
            for b in range(n_batches):
                lo, hi = b * self.bs, min((b + 1) * self.bs, W)
                n, pad = hi - lo, self.bs - (hi - lo)

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

                v = np.asarray(wv[lo:hi])
                if pad:
                    v = np.concatenate([v, np.zeros((pad,) + v.shape[1:],
                                                    np.float32)], 0)

                win_w = np.concatenate(
                    [np.ones(n, np.float32), np.zeros(pad, np.float32)])
                key, sub = jax.random.split(key)
                if noise_provider is None:
                    errors, selections = self._step(
                        params, sub, take(w2d), take(w2d_f), take(w3d),
                        take(traj), put(v.astype(np.float32)), put(win_w),
                        jnp.asarray(cam),
                        distortion=distortion, width=width, height=height)
                else:
                    img0, step_noises = provider_noise(
                        noise_provider, n, pad, self.bs)
                    if self._batch_sharding is not None:
                        step_noises = jax.device_put(
                            step_noises, self._noise_sharding)
                    errors, selections = self._step_noise(
                        params, sub, take(w2d), take(w2d_f), take(w3d),
                        take(traj), put(v.astype(np.float32)), put(win_w),
                        jnp.asarray(cam), put(img0),
                        jnp.asarray(step_noises),
                        distortion=distortion, width=width, height=height)

                weight = n * self.rf
                for m in ("P_Best", "P_Agg"):
                    sums[m] = sums[m] + np.asarray(errors[m], np.float64) * weight
                N += weight
                for m in MODES:
                    sel_parts[m].append(np.asarray(selections[m])[:n])

                if self.quickdebug:
                    break

            Ftot = seq_2d.shape[0]
            for m in MODES:
                sel = np.concatenate(sel_parts[m], axis=0)  # (W',K,F,J,3)
                if self.quickdebug and sel.shape[0] < W:
                    continue
                # stitch per DDIM step, then -> (3, J, Ftot, K) .mat layout
                stitched = np.stack(
                    [stitch_windows(sel[:, k], Ftot) for k in range(sel.shape[1])])
                exports[m][seq_key] = stitched.transpose(3, 2, 1, 0)

            if self.quickdebug:
                break

        results = {m: sums[m] / max(N, 1) for m in ("P_Best", "P_Agg")}

        if export_dir is not None:
            import scipy.io as scio

            os.makedirs(export_dir, exist_ok=True)
            for m in MODES:
                scio.savemat(
                    os.path.join(export_dir, f"inference_data_{m}.mat"),
                    exports[m])
        return results, exports
