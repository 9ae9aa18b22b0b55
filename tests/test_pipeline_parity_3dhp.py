"""WHOLE-PIPELINE parity for the 3DHP entry vs the *executed* reference.

Companion to tests/test_pipeline_parity.py: runs the reference
main_3dhp.py evaluate path (main_3dhp.py:659-912 — mm-scaled diffusion,
valid-frame masks, per-TS cameras with TS5/TS6 distortion switch, window
stitching, 4 pose-selection .mat exports) on tiny synthetic 3DHP-format
npz fixtures via runpy, records its DDIM noise stream, replays it through
our cli driver with converted shared weights, and diffs:
  * all four exported inference_data_<mode>.mat files ELEMENTWISE, and
  * the final P_Best/P_Agg log numbers.
"""

import os
import re
import runpy
import sys
import types

import numpy as np
import pytest

from tests.reference_oracle import (
    reference_available,
    import_reference,
    REFERENCE_PATH,
)
from tests.test_pipeline_parity import (
    _Chdir, _build_fixture, _purge_reference_modules)

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

RF, CS, DEP, H, K = 9, 64, 2, 3, 4
# TS1: 2048x2048 linear projection; TS5: 1920x1080 distortion projection
TEST_SEQS = (("TS1", 21), ("TS5", 16))
JL = [5, 6, 7, 11, 12, 13]
JR = [2, 3, 4, 8, 9, 10]
J = 17


def _make_seq(rng, T, width):
    """Plausible camera-space mm poses + pixel 2D (precision irrelevant —
    both pipelines consume the same file)."""
    root = np.array([0.0, 0.0, 3500.0]) + np.cumsum(
        rng.randn(T, 1, 3) * 10.0, axis=0)
    joints = root + rng.randn(1, J, 3) * 250.0 + np.cumsum(
        rng.randn(T, J, 3) * 5.0, axis=0)
    joints[:, 14] = root[:, 0]  # pelvis IS the root joint
    fx, c = 1500.0, width / 2.0
    p2 = joints[..., :2] / joints[..., 2:3] * fx + c
    return joints.astype(np.float32), p2.astype(np.float32)


def _build_3dhp_fixture(root):
    # the reference main_3dhp.py still loads the H36M npz pair at module
    # level (copy-paste vestige of main.py) — reuse the H36M fixture
    _build_fixture(root)
    rng = np.random.RandomState(11)

    test = {}
    for seq, T in TEST_SEQS:
        w = 1920 if seq in ("TS5", "TS6") else 2048
        p3, p2 = _make_seq(rng, T, w)
        valid = np.ones(T, np.float32)
        valid[3:6] = 0.0  # exercise the valid-frame masking
        test[seq] = {"data_3d": p3, "data_2d": p2, "valid": valid}
    np.savez_compressed(os.path.join(root, "data", "data_test_3dhp_ori.npz"),
                        data=test)

    p3, p2 = _make_seq(rng, 12, 2048)
    train = {"S1 Seq1": [{0: {"data_3d": p3, "data_2d": p2}}]}
    np.savez_compressed(os.path.join(root, "data", "data_train_3dhp_ori.npz"),
                        data=train)

    import torch

    ref_dp = import_reference("common.diffusionpose_3dhp")
    torch.manual_seed(5)
    ref_args = types.SimpleNamespace(
        number_of_frames=RF, cs=CS, dep=DEP, timestep=1000, scale=1.0,
        test_time_augmentation=True,
    )
    model = ref_dp.D3DP(ref_args, JL, JR, is_train=False,
                        num_proposals=H, sampling_timesteps=K)
    for d in ("ckpt3_ref", "ckpt3_ours"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
        torch.save({"epoch": 4, "lr": 6e-5, "model_pos": model.state_dict()},
                   os.path.join(root, d, "parity3.bin"))


def _run_reference(root):
    import torch

    import_reference("common.diffusionpose_3dhp")
    recorded = []
    orig_randn, orig_randn_like = torch.randn, torch.randn_like

    def randn_rec(*a, **k):
        t = orig_randn(*a, **k)
        recorded.append(np.array(t.numpy(), copy=True))
        return t

    def randn_like_rec(*a, **k):
        t = orig_randn_like(*a, **k)
        recorded.append(np.array(t.numpy(), copy=True))
        return t

    argv = [
        "main_3dhp.py", "-k", "gt", "-c", "ckpt3_ref",
        "--evaluate", "parity3.bin", "--nolog",
        "-f", str(RF), "-cs", str(CS), "-dep", str(DEP),
        "-num_proposals", str(H), "-sampling_timesteps", str(K),
        "-gpu", "",
    ]
    old_argv = sys.argv
    _purge_reference_modules()
    torch.randn, torch.randn_like = randn_rec, randn_like_rec
    try:
        sys.argv = argv
        with _Chdir(root):
            runpy.run_path(
                os.path.join(REFERENCE_PATH, "main_3dhp.py"),
                run_name="__main__")
    finally:
        sys.argv = old_argv
        torch.randn, torch.randn_like = orig_randn, orig_randn_like

    groups = []
    i = 0
    while i < len(recorded):
        img0 = recorded[i]
        assert img0.ndim == 5 and img0.shape[1:] == (H, RF, J, 3), (
            f"unexpected draw shape {img0.shape} at {i}")
        steps = recorded[i + 1 : i + K]
        assert all(s.shape == img0.shape for s in steps)
        groups.append((img0, steps))
        i += K
    return groups


def _run_ours(root, noise_groups):
    import jax
    import jax.numpy as jnp
    from d3dp_tpu.cli.arguments import parse_args
    from d3dp_tpu.cli.main_3dhp import (
        _build_models, _load_data, run_evaluation)
    from d3dp_tpu.train.checkpoint_io import load_any

    args = parse_args([
        "-d", "3dhp", "-c", "ckpt3_ours",
        "--evaluate", "parity3.bin", "--nolog",
        "-f", str(RF), "-cs", str(CS), "-dep", str(DEP),
        "-num_proposals", str(H), "-sampling_timesteps", str(K),
        "--eval-batch-size", "2",
    ])
    fifo = list(noise_groups)

    def provider(n):
        assert fifo, "our pipeline requested more noise than the reference drew"
        img0, steps = fifo.pop(0)
        assert img0.shape[0] == n, (img0.shape, n)
        noises = np.zeros((K,) + img0.shape, np.float32)
        for i, s in enumerate(steps):
            noises[i] = s
        return img0.astype(np.float32), noises

    with _Chdir(root):
        data = _load_data(args)
        _, _, d3dp_eval = _build_models(args)
        ckpt = load_any(os.path.join("ckpt3_ours", "parity3.bin"), depth=DEP)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        run_evaluation(args, data, d3dp_eval, params, jax.random.PRNGKey(0),
                       noise_provider=provider)
    assert not fifo, f"{len(fifo)} noise groups unconsumed"


_STEP_RE = re.compile(
    r"^step (\d+) : Protocol #1 Error \(MPJPE\) (\w+): ([\d.]+) mm$")


def _final_metrics(path):
    """Last occurrence per (step, mode) — the reference prints cumulative
    values after every sequence; the final section is the full-set value."""
    out = {}
    with open(path) as f:
        for line in f:
            m = _STEP_RE.match(line.strip())
            if m:
                out[(int(m.group(1)), m.group(2))] = float(m.group(3))
    return out


@needs_ref
@pytest.mark.slow
def test_whole_pipeline_parity_3dhp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipeline_parity_3dhp"))
    _build_3dhp_fixture(root)

    groups = _run_reference(root)
    # TS1: 3 windows -> 2 micro-batches; TS5: 2 windows -> 1
    assert len(groups) == 3, len(groups)

    _run_ours(root, groups)

    import scipy.io as scio

    worst = 0.0
    for mode in ("P_Agg", "P_Best", "J_Best", "J_Agg"):
        ref = scio.loadmat(
            os.path.join(root, "ckpt3_ref", f"inference_data_{mode}.mat"))
        ours = scio.loadmat(
            os.path.join(root, "ckpt3_ours", f"inference_data_{mode}.mat"))
        for seq, _T in TEST_SEQS:
            a, b = np.asarray(ref[seq]), np.asarray(ours[seq])
            assert a.shape == b.shape, (mode, seq, a.shape, b.shape)
            d = float(np.abs(a - b).max())
            worst = max(worst, d)
            assert d <= 0.05, f"{mode}/{seq}: max delta {d} mm"
    print(f"3dhp .mat exports: worst elementwise delta {worst:.2e} mm")

    log = f"3dhp_test_log_H{H}_K{K}.txt"
    ref_m = _final_metrics(os.path.join(root, "ckpt3_ref", log))
    ours_m = _final_metrics(os.path.join(root, "ckpt3_ours", log))
    assert set(ref_m) == set(ours_m) and len(ref_m) == K * 2
    bad = {c: (ref_m[c], ours_m[c]) for c in ref_m
           if abs(ref_m[c] - ours_m[c]) > 1e-3}
    assert not bad, f"metric cells exceeding 1e-3 mm: {bad}"
