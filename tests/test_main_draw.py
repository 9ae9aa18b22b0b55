"""End-to-end smoke of the qualitative-plot entry point (main_draw.py):
synthetic data, random weights, tiny dims -> hypothesis plot PNGs on disk.
(reference: main_draw.py:411-735)"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_main_render_mp4_and_export(tmp_path):
    """main.py --render end-to-end on synthetic data: npy export + mp4
    animation (cv2 writer; no ffmpeg on this host).
    (reference: main.py:796-899)"""
    env = dict(os.environ, PYTHONPATH=REPO)
    out_npy = tmp_path / "pred.npy"
    out_mp4 = tmp_path / "anim.mp4"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"),
         "-d", "synthetic", "--nolog", "-f", "27", "-cs", "64", "-dep", "2",
         "-b", "54", "--synthetic-frames", "120", "--platform", "cpu",
         "-num_proposals", "1", "-sampling_timesteps", "1",
         "--render", "--viz-subject", "S9", "--viz-action", "Act0 1",
         "--viz-export", str(out_npy), "--viz-output", str(out_mp4),
         "--viz-limit", "3"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out_npy.exists(), r.stdout[-1000:]
    import numpy as np

    pred = np.load(out_npy)
    assert pred.ndim == 3 and pred.shape[1:] == (17, 3)
    assert out_mp4.exists() and out_mp4.stat().st_size > 1000


@pytest.mark.slow
def test_main_draw_synthetic(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "main_draw.py"),
         "-d", "synthetic", "--nolog", "-f", "27", "-cs", "64", "-dep", "2",
         "-b", "54", "--synthetic-frames", "120", "--platform", "cpu",
         "-num_proposals", "2", "-sampling_timesteps", "2", "--viz-limit", "2"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    plot_dir = tmp_path / "plot" / "synthetic"
    assert plot_dir.is_dir(), r.stdout[-1000:]
    pngs = list(plot_dir.rglob("*.png"))
    assert pngs, f"no plots written under {plot_dir}"
