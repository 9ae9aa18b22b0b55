"""Visualization smoke tests (Agg backend, pillow gif writer)."""

import os

import numpy as np
import pytest


def _skeleton():
    from d3dp_tpu.data.h36m import h36m_skeleton, H36M_JOINTS_REMOVED

    sk = h36m_skeleton()
    sk.remove_joints(H36M_JOINTS_REMOVED)
    sk._parents[11] = 8
    sk._parents[14] = 8
    return sk


def test_render_animation_gif(tmp_path, rng):
    from d3dp_tpu.viz.visualization import render_animation

    T, J = 6, 17
    keypoints = rng.rand(T, J, 2).astype(np.float32) * 200
    poses = {"Reconstruction": rng.randn(T, J, 3).astype(np.float32) * 0.3}
    out = str(tmp_path / "anim.gif")
    render_animation(
        keypoints,
        {"keypoints_symmetry": ([4, 5, 6], [1, 2, 3])},
        poses, _skeleton(), fps=5, bitrate=1000, azim=70.0, output=out,
        viewport=(200, 200), limit=4, size=3)
    assert os.path.getsize(out) > 1000


def test_render_animation_mp4_cv2(tmp_path, rng):
    """mp4 output without ffmpeg: the cv2.VideoWriter fallback produces a
    playable file (the reference hard-requires matplotlib's ffmpeg writer)."""
    import cv2

    from d3dp_tpu.viz.visualization import render_animation

    T, J = 6, 17
    keypoints = rng.rand(T, J, 2).astype(np.float32) * 200
    poses = {"Reconstruction": rng.randn(T, J, 3).astype(np.float32) * 0.3}
    out = str(tmp_path / "anim.mp4")
    render_animation(
        keypoints,
        {"keypoints_symmetry": ([4, 5, 6], [1, 2, 3])},
        poses, _skeleton(), fps=5, bitrate=1000, azim=70.0, output=out,
        viewport=(200, 200), limit=4, size=3)
    assert os.path.getsize(out) > 1000
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 4, n  # limit=4 frames written


def test_draw_3d_image_select(tmp_path, rng):
    from d3dp_tpu.viz.visualization import draw_3d_image_select

    K, H, T, J = 2, 3, 2, 17
    pred = rng.randn(K, H, T, J, 3).astype(np.float32) * 0.3
    gt = rng.randn(T, J, 3).astype(np.float32) * 0.3
    pred_2d = rng.randn(K, H, T, J, 2).astype(np.float32)
    gt_2d = rng.randn(T, J, 2).astype(np.float32)
    draw_3d_image_select(pred, gt, _skeleton(), 70.0, "S1", "Walk", 0,
                         gt_2d, pred_2d, out_dir=str(tmp_path))
    files = os.listdir(tmp_path / "S1_Walk_0")
    assert len(files) == T


def test_downsample_tensor(rng):
    from d3dp_tpu.viz.visualization import downsample_tensor

    x = rng.randn(10, 4).astype(np.float32)
    d = downsample_tensor(x, 2)
    assert d.shape == (5, 4)
    np.testing.assert_allclose(d[0], x[:2].mean(0), atol=1e-6)


def test_draw_3d_image_azim_sweep(tmp_path, rng):
    """Azimuth variant: every frame_stride-th frame at the final timestep,
    one file per (frame, azim_off) — sweeping azim_off rotates the view
    (reference: common/visualization.py:327-400)."""
    from d3dp_tpu.viz.visualization import draw_3d_image_azim

    K, H, T, J = 2, 3, 5, 17
    pred = rng.randn(K, H, T, J, 3).astype(np.float32) * 0.3
    gt = rng.randn(T, J, 3).astype(np.float32) * 0.3
    for off in (0, 40):
        draw_3d_image_azim(pred, gt, _skeleton(), 70.0, "S1", "Walk", 0,
                           azim_off=off, out_dir=str(tmp_path),
                           frame_stride=4)
    files = sorted(os.listdir(tmp_path))
    # frames 0 and 4, final timestep (t=1), two azimuth offsets
    assert files == [
        "S1_Walk_0_frame0_t1_azim0.png", "S1_Walk_0_frame0_t1_azim40.png",
        "S1_Walk_0_frame4_t1_azim0.png", "S1_Walk_0_frame4_t1_azim40.png",
    ], files


def test_draw_3d_image_azim_ind(tmp_path, rng):
    """Per-joint selection overlay variant: every timestep_stride-th
    timestep, JPMA-selected + oracle-best hypothesis indices drawn per
    joint (reference: common/visualization.py:402-484)."""
    from d3dp_tpu.viz.visualization import draw_3d_image_azim_ind

    K, H, T, J = 4, 3, 3, 17
    pred = rng.randn(K, H, T, J, 3).astype(np.float32) * 0.3
    gt = rng.randn(T, J, 3).astype(np.float32) * 0.3
    sel = rng.randint(0, H, size=(K, 1, T, J))  # reference (K, B=1, T, J)
    mini = rng.randint(0, H, size=(K, T, J))  # squeezed layout also accepted
    draw_3d_image_azim_ind(pred, gt, _skeleton(), 70.0, "S9", "Eat", 1,
                           azim_off=15, select_ind=sel, min_ind=mini,
                           out_dir=str(tmp_path), frame_stride=10,
                           timestep_stride=2)
    files = sorted(os.listdir(tmp_path))
    # frame 0 only (stride 10), timesteps 0 and 2
    assert files == [
        "S9_Eat_1_frame0_t0_azim15.png", "S9_Eat_1_frame0_t2_azim15.png",
    ], files
