"""--render path: predict one sequence, stitch, export / animate.

(reference: main.py:796-899)
"""

import os

import numpy as np

from d3dp_tpu.data.generators import UnchunkedGenerator
from d3dp_tpu.data.windowing import stitch_windows
from d3dp_tpu.geometry.camera import camera_to_world, image_coordinates
from d3dp_tpu.eval import Evaluator
import jax.numpy as jnp


def run_render(args, data, d3dp_eval, params, key, mesh=None):
    input_keypoints = data.keypoints[args.viz_subject][args.viz_action][
        args.viz_camera].copy()
    ground_truth = None
    if args.viz_subject in data.poses_3d and args.viz_action in data.poses_3d[
        args.viz_subject]:
        poses = data.poses_3d[args.viz_subject][args.viz_action]
        if poses is not None:
            ground_truth = poses[args.viz_camera].copy()
    if ground_truth is None:
        print("INFO: this action is unlabeled. Ground truth will not be rendered.")

    cams = [data.cameras[args.viz_subject][args.viz_camera]["intrinsic"]]
    # augment=False: flip TTA is fused inside the sampler, not via a
    # flipped-duplicate sequence from the generator.
    gen = UnchunkedGenerator(
        cams, [ground_truth], [input_keypoints], augment=False,
        kps_left=data.kps_left, kps_right=data.kps_right,
        joints_left=data.joints_left, joints_right=data.joints_right,
    )
    from d3dp_tpu.parallel import round_up_batch

    evaluator = Evaluator(
        d3dp_eval, receptive_field=args.number_of_frames,
        batch_size=round_up_batch(args.batch_size, mesh),
        kps_left=data.kps_left,
        kps_right=data.kps_right, mesh=mesh,
    )
    preds = evaluator.evaluate(params, gen, key, return_predictions=True)
    # (W, K, H, F, J, 3): take final DDIM step, first hypothesis (like the
    # reference's squeeze of the H=1 K=1 render model, main.py:810)
    windows = preds[:, -1, 0]
    total_frames = input_keypoints.shape[0]
    prediction = stitch_windows(windows, total_frames)

    if args.viz_export is not None:
        print("Exporting joint positions to", args.viz_export)
        np.save(args.viz_export, prediction)

    if args.viz_output is not None:
        cam = data.cameras[args.viz_subject][args.viz_camera]
        if ground_truth is not None:
            trajectory = ground_truth[:, :1]
            ground_truth[:, 1:] += trajectory
            prediction = prediction + trajectory
            prediction = np.asarray(camera_to_world(
                jnp.asarray(prediction), cam["orientation"], cam["translation"]))
            ground_truth = np.asarray(camera_to_world(
                jnp.asarray(ground_truth), cam["orientation"], cam["translation"]))
        else:
            prediction = np.asarray(camera_to_world(
                jnp.asarray(prediction), cam["orientation"], 0 * cam["translation"]))
            prediction[:, :, 2] -= np.min(prediction[:, :, 2])

        anim_output = {"Reconstruction": prediction}
        if ground_truth is not None and not args.viz_no_ground_truth:
            anim_output["Ground truth"] = ground_truth

        input_keypoints = image_coordinates(
            input_keypoints[..., :2], w=cam["res_w"], h=cam["res_h"])

        from d3dp_tpu.viz.visualization import render_animation

        render_animation(
            input_keypoints, data.keypoints_metadata, anim_output,
            data.skeleton, data.fps, args.viz_bitrate, cam["azimuth"],
            args.viz_output, limit=args.viz_limit,
            downsample=args.viz_downsample, size=args.viz_size,
            input_video_path=args.viz_video,
            viewport=(cam["res_w"], cam["res_h"]),
            input_video_skip=args.viz_skip,
        )
    return prediction
