"""D3DP diffusion wrapper: x0-predicting training forward and DDIM sampling.

Capability parity with the reference (common/diffusionpose.py:55-320 and the
mm-scaled clone diffusionpose_3dhp.py — here a single `unit_scale` knob), but
structured TPU-first:

  * the K-step DDIM loop is ONE `lax.scan` over precomputed per-step
    constants — no schedule gathers, no Python loop, one compiled denoise
    step reused K times (reference: a Python loop launching 2 full model
    forwards per step, diffusionpose.py:229-254)
  * the H hypotheses live in the batch dimension; flip test-time-augmentation
    is fused as a doubled batch in the SAME forward (reference: two separate
    `pose_estimator` calls, diffusionpose.py:155-156) — twice the MXU
    utilisation per launch, mathematically identical
  * the per-sample random timestep/noise of training (`prepare_targets`'s
    per-sample Python loop, diffusionpose.py:308-320) is a single batched
    randint/normal draw
  * all randomness is explicit: every entry point takes a PRNG key

Quirky reference semantics preserved (they affect metric parity):
  * clamp-to-±1.1·scale sandwich on both x_t and x_start
    (diffusionpose.py:136-142, :302)
  * fresh noise injected every DDIM step with eta=1 (:203-210)
  * flip-TTA averaging BEFORE the x_start clamp (:158-165)
  * all K intermediate x0 predictions returned, stacked at dim 1 (:256)
"""

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3dp_tpu.diffusion.schedule import CosineSchedule
from d3dp_tpu.models.mixste import MixSTE2, MixSTEConfig


def flip_pose(x, perm, coord_axis=-1):
    """Mirror a pose: negate x-coordinate, swap left/right joints.

    x: (..., J, C); perm: (J,) permutation with left<->right swapped.
    (reference: common/diffusionpose.py:150-153)
    """
    x = x * jnp.asarray([-1.0] + [1.0] * (x.shape[-1] - 1), dtype=x.dtype)
    return jnp.take(x, perm, axis=x.ndim - 2)


def reuse_schedule(n_steps, interval):
    """Which DDIM steps run the FULL model under feature reuse: every
    `interval`-th step — and always the final step, whose x_start is the
    headline prediction (leaving it reused is what made interval-2 diverge
    at K=10 while interval-3, which happens to refresh step K-1, looked
    neutral; r4 quantification). NOTE the r5 converged-model rerun found
    ALL fixed intervals >=2 cost accuracy regardless of this fix — reuse
    is an accuracy/speed dial, not a free win (PERFORMANCE.md r5)."""
    sched = jnp.arange(n_steps)
    return ((sched % interval) == 0) | (sched == n_steps - 1)


def make_lr_perm(num_joints, joints_left, joints_right):
    """Permutation swapping left/right joint indices."""
    perm = np.arange(num_joints)
    perm[list(joints_left)] = joints_right
    perm[list(joints_right)] = joints_left
    return perm


@dataclass(frozen=True)
class D3DPConfig:
    model: MixSTEConfig = field(default_factory=MixSTEConfig)
    timesteps: int = 1000
    sampling_timesteps: int = 5
    num_proposals: int = 1
    scale: float = 1.0
    eta: float = 1.0
    flip_tta: bool = True
    unit_scale: float = 1.0  # 1.0 for H36M (metres), 1000.0 for 3DHP (mm)
    # DDIM feature reuse (FRDiff-style, arXiv:2312.03517; PAPERS.md):
    # refresh the deep blocks' cached residual-stream delta every
    # `reuse_interval` steps and reuse it in between, computing only the
    # first `reuse_tap` block pairs fresh. interval <= 1 disables reuse
    # (the default; the sampler is then byte-identical to the reference
    # semantics). Approximate — eval-only accuracy/speed trade-off.
    reuse_interval: int = 1
    reuse_tap: int = 2
    # adaptive refresh (TeaCache-style): additionally refresh whenever the
    # noisy pose has drifted more than `reuse_tau` (relative L2 vs the last
    # refresh point, max over the batch) — the interval then acts as the
    # maximum stretch between refreshes. 0 = pure fixed-interval schedule.
    reuse_tau: float = 0.0
    joints_left: Tuple[int, ...] = (4, 5, 6, 11, 12, 13)
    joints_right: Tuple[int, ...] = (1, 2, 3, 14, 15, 16)


class D3DP:
    """Functional D3DP: holds config + schedule, takes params explicitly."""

    def __init__(self, cfg: D3DPConfig):
        self.cfg = cfg
        self.model = MixSTE2(cfg.model)
        self.schedule = CosineSchedule(cfg.timesteps)
        self._lr_perm = jnp.asarray(
            make_lr_perm(cfg.model.num_joints, cfg.joints_left, cfg.joints_right)
        )
        # device-side f32 copies of the (host f64) schedule tables used by
        # the training-time q_sample gather
        self._sqrt_ac = jnp.asarray(self.schedule.sqrt_alphas_cumprod, jnp.float32)
        self._sqrt_1mac = jnp.asarray(
            self.schedule.sqrt_one_minus_alphas_cumprod, jnp.float32
        )

    # ---------------------------------------------------------------- init
    def init_params(self, rng, batch=1):
        cfg = self.cfg.model
        x2d = jnp.zeros((batch, cfg.num_frames, cfg.num_joints, cfg.in_chans))
        x3d = jnp.zeros((batch, cfg.num_frames, cfg.num_joints, 3))
        t = jnp.zeros((batch,), jnp.int32)
        return self.model.init(rng, x2d, x3d, t)

    # ------------------------------------------------------------ training
    def train_forward(self, params, rng, x2d, x3d, train: bool = True,
                      t_noise_override=None):
        """Denoise a q-sampled pose; returns the x0 prediction (B,F,J,3).

        Vectorised equivalent of prepare_targets + the train branch of
        forward (diffusionpose.py:279-320): per-SAMPLE random t and noise.
        `t_noise_override=(t, noise)` replaces the random draws — used for
        deterministic replay and RNG-injected parity tests.
        """
        cfg = self.cfg
        B, F, J, _ = x3d.shape
        key_t, key_noise, key_drop = jax.random.split(rng, 3)

        x3d = x3d / cfg.unit_scale
        if t_noise_override is not None:
            t, noise = t_noise_override
            t = jnp.asarray(t, jnp.int32)
            noise = jnp.asarray(noise, jnp.float32)
        else:
            t = jax.random.randint(key_t, (B,), 0, cfg.timesteps)
            noise = jax.random.normal(key_noise, x3d.shape, jnp.float32)

        x_start = x3d * cfg.scale
        coef1 = self._sqrt_ac[t][:, None, None, None]
        coef2 = self._sqrt_1mac[t][:, None, None, None]
        x = coef1 * x_start + coef2 * noise
        x = jnp.clip(x, -1.1 * cfg.scale, 1.1 * cfg.scale)
        x = x / cfg.scale

        pred = self.model.apply(
            params,
            x2d,
            x,
            t,
            deterministic=not train,
            rngs={"dropout": key_drop} if train else {},
        )
        return pred * cfg.unit_scale

    # ------------------------------------------------------------ sampling
    def sample(self, params, rng, x2d, x2d_flip=None, num_proposals=None,
               sampling_timesteps=None, noise_override=None):
        """DDIM-sample H hypotheses, returning all K intermediate x0 preds.

        x2d: (B, F, J, 2); x2d_flip: the keypoint-symmetry-flipped copy
        (required when cfg.flip_tta). Returns (B, K, H, F, J, 3), in the
        dataset's native units (unit_scale applied).

        `noise_override=(img0, step_noises)` with img0 (B,H,F,J,3) and
        step_noises (K,B,H,F,J,3) replaces the random draws — used for
        deterministic replay and RNG-injected parity tests (the final step's
        noise is multiplied by sigma=0 and never affects output).
        """
        cfg = self.cfg
        H = num_proposals or cfg.num_proposals
        K = sampling_timesteps or cfg.sampling_timesteps
        B, F, J, _ = x2d.shape
        flip = cfg.flip_tta
        if flip and x2d_flip is None:
            raise ValueError("flip_tta requires x2d_flip")

        consts = self.schedule.ddim_step_constants(K, cfg.eta)
        consts = {k: jnp.asarray(v) for k, v in consts.items()}
        scale = cfg.scale

        key_init, key_steps = jax.random.split(rng)
        if noise_override is not None:
            img0 = jnp.asarray(noise_override[0], jnp.float32)
            step_noises = jnp.asarray(noise_override[1], jnp.float32)
        else:
            img0 = jax.random.normal(key_init, (B, H, F, J, 3), jnp.float32)
            step_noises = jax.random.normal(
                key_steps, (K, B, H, F, J, 3), jnp.float32
            )

        # conditioning, broadcast over hypotheses and folded into the batch;
        # with flip-TTA the mirrored copy rides in the same forward
        def fold(x):  # (B,F,J,C) -> (B*H,F,J,C)
            return jnp.broadcast_to(
                x[:, None], (B, H) + x.shape[1:]
            ).reshape(B * H, *x.shape[1:])

        cond = fold(x2d)
        if flip:
            cond = jnp.concatenate([cond, fold(x2d_flip)], axis=0)

        perm = self._lr_perm

        def to_flat(img):
            """(B,H,F,J,3) noisy pose -> clamped, flip-doubled model input."""
            x_t = jnp.clip(img, -1.1 * scale, 1.1 * scale) / scale
            x_flat = x_t.reshape(B * H, F, J, 3)
            if flip:
                x_flat = jnp.concatenate([x_flat, flip_pose(x_flat, perm)], axis=0)
            return x_flat

        def from_flat(pred):
            """Flip-average the model output back to (B,H,F,J,3)."""
            if flip:
                pred_n, pred_f = jnp.split(pred, 2, axis=0)
                pred = (pred_n + flip_pose(pred_f, perm)) / 2
            return pred.reshape(B, H, F, J, 3)

        def denoise(img, t_scalar):
            """One model evaluation (flip-fused) -> x0 prediction (B,H,F,J,3)."""
            x_flat = to_flat(img)
            t_vec = jnp.full((x_flat.shape[0],), t_scalar, jnp.int32)
            pred = self.model.apply(params, cond, x_flat, t_vec, deterministic=True)
            return from_flat(pred)

        def ddim_update(img, pred_pose, c, noise):
            x_start = jnp.clip(pred_pose * scale, -1.1 * scale, 1.1 * scale)
            pred_noise = (c["sqrt_recip_ac"] * img - x_start) / c["sqrt_recipm1_ac"]
            img_next = (
                x_start * c["alpha_next_sqrt"] + c["c"] * pred_noise + c["sigma"] * noise
            )
            img = jnp.where(c["is_last"] > 0, x_start, img_next)
            return img, x_start

        R = cfg.reuse_interval
        if R <= 1:
            def step(img, xs):
                c, noise = xs
                img, x_start = ddim_update(img, denoise(img, c["t"]), c, noise)
                return img, x_start

            _, preds_all = jax.lax.scan(step, img0, (consts, step_noises))
        else:
            # DDIM feature reuse (FRDiff-style): on refresh steps run the
            # full model and cache the deep blocks' residual-stream delta;
            # in between, run only the first `reuse_tap` block pairs and
            # apply the cached delta. One lax.cond inside the scan — both
            # branches compile once, only one executes per step.
            tap = cfg.reuse_tap
            tau = cfg.reuse_tau
            mcfg = self.cfg.model
            rows = B * H * (2 if flip else 1)
            delta0 = jnp.zeros((rows, F, J, mcfg.embed_dim), mcfg.dtype)
            is_full = reuse_schedule(len(step_noises), R)

            def denoise_full(img, t_scalar):
                x_flat = to_flat(img)
                t_vec = jnp.full((x_flat.shape[0],), t_scalar, jnp.int32)
                pred, delta = self.model.apply(
                    params, cond, x_flat, t_vec, deterministic=True,
                    reuse_tap=tap)
                return from_flat(pred), delta

            def denoise_reuse(img, t_scalar, delta):
                x_flat = to_flat(img)
                t_vec = jnp.full((x_flat.shape[0],), t_scalar, jnp.int32)
                pred = self.model.apply(
                    params, cond, x_flat, t_vec, deterministic=True,
                    reuse_tap=tap, deep_delta=delta)
                return from_flat(pred)

            def step(carry, xs):
                img, delta, img_ref = carry
                c, noise, sched_full = xs
                full = sched_full
                if tau > 0:
                    # adaptive: refresh when the noisy pose drifted beyond
                    # tau (relative L2, max over the folded batch) since the
                    # last refresh — cond's predicate must be one scalar, so
                    # the most-drifted sample decides for the whole batch
                    drift = jnp.linalg.norm(
                        (img - img_ref).reshape(B * H, -1), axis=-1
                    ) / (jnp.linalg.norm(
                        img_ref.reshape(B * H, -1), axis=-1) + 1e-8)
                    full = jnp.logical_or(sched_full, jnp.max(drift) > tau)
                pred_pose, delta, img_ref = jax.lax.cond(
                    full,
                    lambda im, d, r: denoise_full(im, c["t"]) + (im,),
                    lambda im, d, r: (denoise_reuse(im, c["t"], d), d, r),
                    img, delta, img_ref,
                )
                img, x_start = ddim_update(img, pred_pose, c, noise)
                return (img, delta, img_ref), x_start

            _, preds_all = jax.lax.scan(
                step, (img0, delta0, img0), (consts, step_noises, is_full))
        # (K,B,H,F,J,3) -> (B,K,H,F,J,3), matching the reference stack dim
        preds_all = jnp.moveaxis(preds_all, 0, 1)
        return preds_all * cfg.unit_scale
