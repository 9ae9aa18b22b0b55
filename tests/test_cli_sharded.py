"""Multi-device execution from the user-facing entry points: `--dp/--tp`
build a mesh inside main.py / main_3dhp.py (the reference is multi-GPU by
default via nn.DataParallel, main.py:241-248) and the sharded run produces
the same numbers as the single-device run.

Runs the real CLIs as subprocesses on an 8-virtual-CPU-device backend.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = [
    "-d", "synthetic", "--nolog", "-f", "27", "-cs", "64", "-dep", "2",
    "-s", "27", "--synthetic-frames", "150", "--platform", "cpu",
    "--num-virtual-devices", "8", "--seed", "1",
]


def run_cli(script, tmp_path, extra):
    cmd = [sys.executable, script] + BASE + ["-c", str(tmp_path)] + extra
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=560)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    return r.stdout


def train_losses(stdout):
    """[(train, valid), ...] per epoch from the reference-format log line."""
    rows = re.findall(r"3d_train ([\d.]+) 3d_pos_valid ([\d.]+)", stdout)
    assert rows, stdout[-2000:]
    return np.asarray(rows, dtype=np.float64)


def eval_errors(stdout):
    rows = re.findall(
        r"step \d+ : Protocol #1 Error \(MPJPE\) (\w+): ([\d.]+) mm", stdout)
    assert rows, stdout[-2000:]
    return {m: float(v) for m, v in rows}


@pytest.mark.slow
def test_h36m_cli_sharded_matches_single_device(tmp_path):
    out_1 = run_cli("main.py", tmp_path / "dp1",
                    ["-e", "2", "-b", "108", "-cf", "2", "--dp", "1"])
    out_8 = run_cli("main.py", tmp_path / "dp8",
                    ["-e", "2", "-b", "108", "-cf", "2",
                     "--dp", "4", "--tp", "2"])
    assert "4-device mesh" not in out_1
    assert "8-device mesh (dp=4, tp=2)" in out_8

    l1, l8 = train_losses(out_1), train_losses(out_8)
    assert l1.shape == l8.shape == (2, 2)
    # identical data/seed; deltas are only collective reduction order
    np.testing.assert_allclose(l8, l1, rtol=2e-4)

    # sharded evaluation from the trained checkpoint (all 4 modes + mesh)
    ev_1 = eval_errors(run_cli(
        "main.py", tmp_path / "dp1",
        ["--evaluate", "epoch_2.ckpt", "-b", "4", "-num_proposals", "2",
         "-sampling_timesteps", "2", "--dp", "1"]))
    ev_8 = eval_errors(run_cli(
        "main.py", tmp_path / "dp1",
        ["--evaluate", "epoch_2.ckpt", "-b", "4", "-num_proposals", "2",
         "-sampling_timesteps", "2", "--dp", "4", "--tp", "2"]))
    for mode in ("J_Best", "P_Best", "P_Agg", "J_Agg"):
        assert abs(ev_8[mode] - ev_1[mode]) < 1e-2, (mode, ev_1, ev_8)


@pytest.mark.slow
def test_h36m_cli_defaults_to_all_devices(tmp_path):
    """No --dp/--tp: every visible device is used (DataParallel-default
    parity) — 8 virtual devices become a dp=8 mesh."""
    out = run_cli("main.py", tmp_path,
                  ["-e", "1", "-b", "216", "-cf", "1", "--debug"])
    assert "8-device mesh (dp=8, tp=1)" in out


@pytest.mark.slow
def test_elastic_topology_resume(tmp_path):
    """Checkpoints are topology-free: train under dp=4xtp=2, then resume the
    SAME checkpoint under dp=8xtp=1 and under a single device — epoch 3 is
    identical either way (params/optimizer re-shard on load; batch padding
    is weight-0 so dp size never changes the loss)."""
    ckdir = tmp_path / "ck"
    run_cli("main.py", ckdir, ["-e", "2", "-b", "108", "-cf", "2",
                               "--dp", "4", "--tp", "2"])
    out_a = run_cli("main.py", ckdir, ["-e", "3", "-b", "108", "-cf", "3",
                                       "-r", "auto", "--dp", "8", "--tp", "1"])
    # re-resume from the same epoch_2 checkpoint on one device
    os.remove(ckdir / "epoch_3.ckpt")
    out_b = run_cli("main.py", ckdir, ["-e", "3", "-b", "108", "-cf", "3",
                                       "-r", "epoch_2.ckpt", "--dp", "1"])
    l_a, l_b = train_losses(out_a), train_losses(out_b)
    assert l_a.shape == l_b.shape == (1, 2)
    np.testing.assert_allclose(l_a, l_b, rtol=2e-4)


@pytest.mark.slow
def test_3dhp_cli_sharded_matches_single_device(tmp_path):
    base3 = ["-e", "1", "-b", "108", "-cf", "1",
             "--synthetic-frames", "108"]
    out_1 = run_cli("main_3dhp.py", tmp_path / "dp1", base3 + ["--dp", "1"])
    out_8 = run_cli("main_3dhp.py", tmp_path / "dp8",
                    base3 + ["--dp", "4", "--tp", "2"])
    assert "8-device mesh (dp=4, tp=2)" in out_8
    l1 = re.findall(r"3d_train ([\d.]+)", out_1)
    l8 = re.findall(r"3d_train ([\d.]+)", out_8)
    np.testing.assert_allclose(
        np.asarray(l8, np.float64), np.asarray(l1, np.float64), rtol=2e-4)

    ev = run_cli("main_3dhp.py", tmp_path / "dp8",
                 ["--evaluate", "epoch_1.ckpt", "-num_proposals", "2",
                  "-sampling_timesteps", "2", "--synthetic-frames", "108",
                  "--dp", "4", "--tp", "2"])
    assert "P_Best" in ev
