"""Qualitative multi-hypothesis visualization entry point.

Parity with the reference main_draw.py: evaluation-only — sample ALL K x H
hypotheses for a chosen subject/action, stitch windows to the full sequence,
reproject every hypothesis to 2D, and render per-frame 3D plots with the
mean pose and the JPMA-selected pose overlaid (main_draw.py:411-491,
:531-536, :730-735; output ./plot/h36m/).
"""

import os

import numpy as np

from d3dp_tpu.cli.arguments import parse_args, apply_platform_args
from d3dp_tpu.cli.data_prep import prepare_data
from d3dp_tpu.cli.main_h36m import _build_models
from d3dp_tpu.data.windowing import (
    window_sequence, stitch_windows, sample_windows)


def collect_predictions(d3dp, params, seq_2d, kps_left, kps_right, rf, bs, key,
                        mesh=None):
    """Sample every window of one sequence -> stitched (K, H, Ftot, J, 3).

    `mesh` (optional): window micro-batches shard over its 'dp' axis (padded
    rows are dropped after the gather) — the TPU-native replacement for the
    reference's DataParallel wrap around its eval model (main.py:246-248)."""
    seq_2d_flip = seq_2d.copy()
    seq_2d_flip[..., 0] *= -1
    seq_2d_flip[:, kps_left + kps_right] = seq_2d_flip[:, kps_right + kps_left]

    w2d = window_sequence(seq_2d, rf)
    w2d_f = window_sequence(seq_2d_flip, rf)
    preds = sample_windows(d3dp, params, w2d, w2d_f, bs, key,
                           mesh=mesh)  # (W, K, H, rf, J, 3)

    Ftot = seq_2d.shape[0]
    K, H = preds.shape[1], preds.shape[2]
    stitched = np.stack(
        [
            np.stack([stitch_windows(preds[:, k, h], Ftot) for h in range(H)])
            for k in range(K)
        ]
    )  # (K, H, Ftot, J, 3)
    return stitched


def main(argv=None):
    args = parse_args(argv)
    apply_platform_args(args)

    import jax
    import jax.numpy as jnp
    from d3dp_tpu.train.checkpoint_io import load_any
    from d3dp_tpu.geometry.camera import project_to_2d
    from d3dp_tpu.viz.visualization import draw_3d_image_select

    print("Drawing...")
    data = prepare_data(args)
    _, _, d3dp_eval = _build_models(args, data)
    key = jax.random.PRNGKey(args.seed)
    params = d3dp_eval.init_params(key)
    if args.evaluate:
        ckpt = load_any(os.path.join(args.checkpoint, args.evaluate),
                        depth=args.dep)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])

    # multi-device by default, like every other entry point (the reference
    # wraps its eval model in DataParallel unconditionally, main.py:246-248)
    from d3dp_tpu.parallel import auto_mesh, shard_model_params

    mesh = auto_mesh(args.dp, args.tp)
    if mesh is not None:
        print(f"INFO: {mesh.devices.size}-device mesh "
              f"(dp={mesh.shape['dp']}, tp={mesh.shape['tp']})")
    params = shard_model_params(params, mesh)

    subject = args.viz_subject or args.subjects_test.split(",")[0]
    action = args.viz_action or data.actions_of(subject)[0]
    cam_idx = args.viz_camera

    seq_2d = np.asarray(data.keypoints[subject][action][cam_idx], np.float32)
    seq_3d = np.asarray(data.poses_3d[subject][action][cam_idx], np.float32)
    cam = data.cameras[subject][cam_idx]

    key, sub = jax.random.split(key)
    preds = collect_predictions(
        d3dp_eval, params, seq_2d, data.kps_left, data.kps_right,
        args.number_of_frames, max(args.batch_size // args.number_of_frames, 1),
        sub, mesh=mesh)  # (K,H,Ftot,J,3)

    # root-zero + reproject every hypothesis (main_draw.py:479-536)
    traj = seq_3d[:, :1].copy()
    gt = seq_3d.copy()
    gt[:, 0] = 0
    preds[..., 0, :] = 0
    K, H, Ftot, J, _ = preds.shape
    pred_abs = preds + traj[None, None]
    pred_2d = np.asarray(
        project_to_2d(
            jnp.asarray(pred_abs.reshape(1, -1, 3)),
            jnp.asarray(np.asarray(cam["intrinsic"])[None]),
        )
    ).reshape(K, H, Ftot, J, 2)

    out_dir = os.path.join("plot", args.dataset)
    limit = args.viz_limit if args.viz_limit > 0 else min(Ftot, 10)
    draw_3d_image_select(
        preds[:, :, :limit], gt[:limit], data.skeleton, 70.0,
        subject, action.replace(" ", "_"), cam_idx,
        seq_2d[:limit], pred_2d[:, :, :limit], out_dir=out_dir)
    print(f"Saved hypothesis plots to {out_dir}")


if __name__ == "__main__":
    main()
