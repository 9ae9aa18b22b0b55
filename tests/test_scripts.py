"""Smoke tests for the benchmark/scaling scripts (subprocesses: they
configure their own JAX backend, which must happen before first use)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, timeout=540):
    return subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout)


def last_json(stdout):
    lines = [l for l in stdout.strip().splitlines() if l.startswith("{")]
    assert lines, stdout
    return json.loads(lines[-1])


@pytest.mark.slow
def test_hostfeed_bench():
    r = run([sys.executable, "scripts/bench_hostfeed.py",
             "--minutes-of-data", "3", "--frames", "81"])
    assert r.returncode == 0, r.stderr[-2000:]
    d = last_json(r.stdout)
    assert d["metric"] == "host_feed_frames_per_sec"
    assert d["value"] > 0
    assert set(d["detail"]) >= {"cpp_assembler", "numpy_fallback",
                                "cpp_plus_prefetcher"}


@pytest.mark.slow
def test_bench_dp_scaling_mode():
    r = run([sys.executable, "bench.py", "--dp", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    d = last_json(r.stdout)
    assert d["metric"] == "virtual_mesh_dp_scaling"
    by_dp = d["detail"]["hyp_frames_per_sec_by_dp"]
    assert set(by_dp) == {"1", "2"}
    assert all(v > 0 for v in by_dp.values())


def test_campaign_shell_syntax():
    """The TPU campaign scripts must at least parse (bash -n) — a syntax
    error discovered mid-campaign wastes a healthy tunnel window."""
    import glob

    for sh in glob.glob(os.path.join(REPO, "scripts", "*.sh")):
        r = run(["bash", "-n", sh])
        assert r.returncode == 0, (sh, r.stderr)


@pytest.mark.slow
def test_ab_gate_smoke():
    """The bf16-train convergence gate harness runs end-to-end at tiny dims
    (fresh per-arm random weights) and emits the verdict JSON."""
    r = run([sys.executable, "scripts/ab_gate.py", "--small",
             "--platform", "cpu", "--out", "/tmp/ab_gate_smoke.json"])
    assert r.returncode == 0, r.stderr[-2000:]
    d = last_json(r.stdout)
    assert set(d) == {"gate_pass", "final_step_deltas"}
    assert set(d["final_step_deltas"]) == {"J_Best", "P_Best", "P_Agg",
                                           "J_Agg"}
    with open("/tmp/ab_gate_smoke.json") as f:
        full = json.load(f)
    assert full["criterion"].startswith("per mode")
    # distinct random weights per arm: the smoke must exercise real deltas
    assert any(v["delta_mm"] != 0 for v in d["final_step_deltas"].values())


def test_bench_eval_e2e_cells_tiny():
    """bench.py's eval-e2e helper (sequences/s with P2 off/host/device) at
    tiny dims: all three cells must produce numbers, not error records, and
    the device-P2 cell must not silently skip P2 (in-process; conftest's
    8-virtual-CPU backend)."""
    import jax
    import bench
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig
    from d3dp_tpu.data.synthetic import JOINTS_LEFT, JOINTS_RIGHT

    d3dp = D3DP(D3DPConfig(
        model=MixSTEConfig(num_frames=27, embed_dim=64, depth=2),
        num_proposals=2, sampling_timesteps=2,
        joints_left=tuple(JOINTS_LEFT), joints_right=tuple(JOINTS_RIGHT)))
    params = d3dp.init_params(jax.random.PRNGKey(0))
    out = bench._eval_e2e_bench(d3dp, params, rf=27, bs=4,
                                lengths=(60, 45), label="tiny")
    for cell in ("p2_off", "p2_host", "p2_device"):
        assert "error" not in out[cell], out[cell]
        assert out[cell]["sequences_per_sec"] > 0
    assert "p2_host_overhead_frac" in out
    assert "p2_device_speedup_vs_host" in out
