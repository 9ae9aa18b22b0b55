"""In-the-wild video -> 2D keypoints -> multi-hypothesis 3D pose inference.

Capability parity with the reference kit (in_the_wild/videopose_diffusion.py,
in_the_wild/utils.py): pluggable external 2D detectors (AlphaPose / HRNet
from the video-to-pose3D repo) or precomputed-keypoint npz files, COCO-layout
keypoint symmetry, screen normalisation by the actual frame size, 2D-only
windowed DDIM sampling, window stitching, camera-to-world with the fixed
H36M rotation, height rebase, npy exports, and per-frame 3D renders.

The sampling path is the same jitted lax.scan sampler as every other entry
point — one compiled denoise step, hypotheses in the batch dim.
"""

import os
import time

import numpy as np

# COCO-17 keypoint layout of the external detectors
COCO_METADATA = {
    "layout_name": "coco",
    "num_joints": 17,
    "keypoints_symmetry": [[1, 3, 5, 7, 9, 11, 13, 15],
                           [2, 4, 6, 8, 10, 12, 14, 16]],
}
JOINTS_LEFT = [4, 5, 6, 11, 12, 13]
JOINTS_RIGHT = [1, 2, 3, 14, 15, 16]

# fixed H36M camera rotation for world-frame display
# (in_the_wild/videopose_diffusion.py:181)
H36M_ROT = np.array(
    [0.14070565, -0.15007018, -0.7552408, 0.62232804], dtype=np.float32)


class Timer:
    """Wall-clock context timer. (in_the_wild/utils.py:87-98)"""

    def __init__(self, message):
        self.message = message

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *exc):
        print(f"{self.message} --- elapsed {time.time() - self.start:.2f} s")


def get_detector_2d(detector_name):
    """Resolve a 2D keypoint generator by name.

    'alpha_pose' / 'hr_pose' import from the external video-to-pose3D repo
    (must be on sys.path, reference README.md:81-86); 'npz' returns a loader
    of precomputed (N, 17, 2) keypoints next to the video.
    """
    def get_alpha_pose():
        from joints_detectors.Alphapose.gene_npz import (
            generate_kpts as alpha_pose)
        return alpha_pose

    def get_hr_pose():
        from joints_detectors.hrnet.pose_estimation.video import (
            generate_kpts as hr_pose)
        return hr_pose

    def get_npz():
        def load_npz(video_path):
            npz_path = os.path.splitext(video_path)[0] + ".npz"
            data = np.load(npz_path)
            return data["kpts"]
        return load_npz

    detector_map = {
        "alpha_pose": get_alpha_pose,
        "hr_pose": get_hr_pose,
        "npz": get_npz,
    }
    assert detector_name in detector_map, (
        f"2D detector: {detector_name} not implemented yet!")
    return detector_map[detector_name]()


def split_video(video_path, segment_frames=1000, out_dir=None):
    """Split a long video into fixed-length segments (cv2), returning the
    written paths. (reference: in_the_wild/utils.py:139)"""
    import cv2

    out_dir = out_dir or os.path.dirname(video_path) or "."
    base = os.path.splitext(os.path.basename(video_path))[0]
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    paths, writer, idx, n = [], None, 0, 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if n % segment_frames == 0:
            if writer is not None:
                writer.release()
            path = os.path.join(out_dir, f"{base}_part{idx:03d}.mp4")
            writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
            paths.append(path)
            idx += 1
        writer.write(frame)
        n += 1
    if writer is not None:
        writer.release()
    cap.release()
    return paths


def video_frame_size(video_path):
    import cv2

    cap = cv2.VideoCapture(video_path)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    return w, h


def sample_video_keypoints(d3dp, params, keypoints_norm, rf, bs, key,
                           mesh=None):
    """2D-only windowed sampling -> stitched (K, H, Ftot, 17, 3).

    `mesh` (optional): windows shard over its 'dp' axis — the TPU-native
    replacement for the reference's DataParallel wrap
    (videopose_diffusion.py:101)."""
    from d3dp_tpu.data.windowing import (
        window_sequence, stitch_windows, sample_windows)

    kl, kr = COCO_METADATA["keypoints_symmetry"]
    seq_flip = keypoints_norm.copy()
    seq_flip[..., 0] *= -1
    seq_flip[:, kl + kr] = seq_flip[:, kr + kl]

    w2d = window_sequence(keypoints_norm.astype(np.float32), rf)
    w2d_f = window_sequence(seq_flip.astype(np.float32), rf)
    preds = sample_windows(d3dp, params, w2d, w2d_f, bs, key,
                           mesh=mesh)  # (W,K,H,rf,J,3)

    Ftot = keypoints_norm.shape[0]
    K, H = preds.shape[1], preds.shape[2]
    return np.stack([
        np.stack([stitch_windows(preds[:, k, h], Ftot) for h in range(H)])
        for k in range(K)
    ])  # (K,H,Ftot,J,3)


def main(args):
    """Full pipeline for one video. (videopose_diffusion.py:64-208)"""
    import jax
    import jax.numpy as jnp
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig
    from d3dp_tpu.geometry.camera import (
        normalize_screen_coordinates, camera_to_world)
    from d3dp_tpu.train.checkpoint_io import load_any

    detector_2d = get_detector_2d(args.detector_2d)
    keypoints = detector_2d(args.viz_video)

    frame_width, frame_height = video_frame_size(args.viz_video)
    keypoints_norm = np.asarray(normalize_screen_coordinates(
        np.asarray(keypoints[..., :2], np.float32), w=frame_width,
        h=frame_height))

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    d3dp = D3DP(D3DPConfig(
        model=MixSTEConfig(num_frames=args.number_of_frames,
                           embed_dim=args.cs, depth=args.dep, dtype=dtype),
        num_proposals=args.num_proposals,
        sampling_timesteps=args.sampling_timesteps,
        scale=args.scale, timesteps=args.timestep,
        joints_left=tuple(JOINTS_LEFT), joints_right=tuple(JOINTS_RIGHT),
        flip_tta=args.test_time_augmentation,
        reuse_interval=max(args.ddim_reuse, 1),
        reuse_tap=max(1, min(args.ddim_reuse_tap, args.dep)),
        reuse_tau=args.ddim_reuse_adaptive))

    print("Loading checkpoint", args.evaluate)
    ckpt = load_any(args.evaluate, depth=args.dep)
    params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])

    # multi-device by default (reference: DataParallel wrap,
    # videopose_diffusion.py:101-102)
    from d3dp_tpu.parallel import auto_mesh, shard_model_params

    mesh = auto_mesh(args.dp, args.tp)
    if mesh is not None:
        print(f"INFO: {mesh.devices.size}-device mesh "
              f"(dp={mesh.shape['dp']}, tp={mesh.shape['tp']})")
    params = shard_model_params(params, mesh)

    key = jax.random.PRNGKey(args.seed)
    with Timer("sampling"):
        prediction = sample_video_keypoints(
            d3dp, params, keypoints_norm, args.number_of_frames,
            max(args.batch_size // args.number_of_frames, 1), key, mesh=mesh)

    save_dir = os.path.join("outputs", args.video_name)
    os.makedirs(save_dir, exist_ok=True)
    np.save(os.path.join(
        save_dir, f"test_3d_{args.video_name}_output.npy"), prediction)

    # world frame + height rebase (videopose_diffusion.py:180-184)
    pred_world = np.array(camera_to_world(
        jnp.asarray(prediction), H36M_ROT, np.zeros(3, np.float32)))
    pred_world[..., 2] -= pred_world[..., 2].min()
    np.save(os.path.join(
        save_dir, f"test_3d_output_{args.video_name}_postprocess.npy"),
        pred_world)

    if getattr(args, "render_frames", True):
        from d3dp_tpu.viz.visualization import draw_3d_image
        from d3dp_tpu.data.h36m import h36m_skeleton, H36M_JOINTS_REMOVED

        skeleton = h36m_skeleton()
        skeleton.remove_joints(H36M_JOINTS_REMOVED)
        limit = args.viz_limit if args.viz_limit > 0 else min(
            pred_world.shape[2], 10)
        # final DDIM step hypotheses, world frame
        draw_3d_image(
            pred_world[:, :, :limit],
            pred_world[-1, 0, :limit],  # first hypothesis as anchor overlay
            skeleton, 70.0, args.video_name, "wild", 0, out_dir=save_dir)
    return pred_world


def inference_video(video_path, detector_2d, checkpoint=None, argv=None):
    """video -> 2D -> multi-hypothesis 3D. (videopose_diffusion.py:210-232)"""
    from d3dp_tpu.cli.arguments import parse_args, apply_platform_args

    args = parse_args(argv or [], in_the_wild=True)
    apply_platform_args(args)
    args.detector_2d = detector_2d
    basename = os.path.basename(video_path)
    args.video_name = basename[: basename.rfind(".")]
    args.viz_video = video_path
    args.evaluate = checkpoint or "./checkpoint/in_the_wild_best_epoch.bin"

    with Timer(video_path):
        return main(args)
