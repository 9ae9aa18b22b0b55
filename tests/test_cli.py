"""End-to-end CLI smoke: train -> checkpoint -> evaluate on synthetic data,
exercising the same entry point a user runs (equivalent of the reference's
--debug quickdebug path, its only smoke test)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(tmp_path, extra):
    cmd = [
        sys.executable, "main.py", "-d", "synthetic", "--nolog",
        "-f", "27", "-cs", "64", "-dep", "2", "-s", "27",
        "--synthetic-frames", "150", "-c", str(tmp_path), "--platform", "cpu",
        "--debug",
    ] + extra
    return subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=560
    )


@pytest.mark.slow
def test_train_then_evaluate(tmp_path):
    r = run_cli(tmp_path, ["-e", "1", "-b", "108", "-cf", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "3d_train" in r.stdout
    assert os.path.exists(os.path.join(tmp_path, "best_epoch.ckpt"))

    r2 = run_cli(
        tmp_path,
        ["--evaluate", "best_epoch.ckpt", "-b", "4",
         "-num_proposals", "2", "-sampling_timesteps", "2"],
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Protocol #1 Error (MPJPE) J_Agg" in r2.stdout
    # per-config txt log written like the reference (main.py:745)
    assert os.path.exists(os.path.join(tmp_path, "h36m_test_log_H2_K2.txt"))

    # the qualified bf16+Pallas fast path trains + evaluates end-to-end
    # (interpret-mode kernels on CPU; real-chip qualification evidence in
    # PERFORMANCE.md: 22-epoch trajectory parity + flagship grad cosine)
    r_fast = run_cli(
        tmp_path,
        ["-e", "1", "-b", "108", "-cf", "1",
         "--dtype", "bfloat16", "--attention", "pallas"],
    )
    assert r_fast.returncode == 0, r_fast.stderr[-2000:]
    assert "3d_train" in r_fast.stdout

    # DDIM feature-reuse sampling mode (--ddim-reuse) evaluates end-to-end
    r3 = run_cli(
        tmp_path,
        ["--evaluate", "best_epoch.ckpt", "-b", "4",
         "-num_proposals", "2", "-sampling_timesteps", "3",
         "--ddim-reuse", "2", "--ddim-reuse-tap", "1"],
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert "Protocol #1 Error (MPJPE) J_Agg" in r3.stdout


@pytest.mark.slow
def test_3dhp_train_then_evaluate(tmp_path):
    cmd = [
        sys.executable, "main_3dhp.py", "-d", "synthetic", "--nolog",
        "-f", "27", "-cs", "64", "-dep", "2", "-s", "27",
        "--synthetic-frames", "108", "-c", str(tmp_path), "--platform", "cpu",
        "--debug", "-e", "1", "-b", "108", "-cf", "1",
    ]
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(tmp_path, "best_epoch.ckpt"))

    cmd = [
        sys.executable, "main_3dhp.py", "-d", "synthetic", "--nolog",
        "-f", "27", "-cs", "64", "-dep", "2", "-s", "27",
        "--synthetic-frames", "108", "-c", str(tmp_path), "--platform", "cpu",
        "--evaluate", "best_epoch.ckpt",
        "-num_proposals", "2", "-sampling_timesteps", "2",
    ]
    r2 = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                        timeout=560)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "P_Best" in r2.stdout
    # four aggregation-mode exports for the PCK/AUC harness
    for mode in ("P_Agg", "P_Best", "J_Best", "J_Agg"):
        assert os.path.exists(
            os.path.join(tmp_path, f"inference_data_{mode}.mat"))
