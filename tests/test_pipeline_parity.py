"""WHOLE-PIPELINE parity vs the *executed* reference.

Every layer (model, sampler, metrics, windowing) is parity-tested in
isolation elsewhere; this harness closes the wiring-level gap: it runs
`/root/reference/main.py`'s actual evaluate path (main.py:596-794 +
run_evaluation :952-1046) via runpy on a tiny synthetic H36M-format npz
fixture, records every DDIM noise draw, then runs OUR cli driver
(d3dp_tpu.cli.main_h36m.run_evaluation) on the same fixture with the same
converted weights and the replayed noise stream — and diffs every number in
the two result logs (per-action and action-wise-average, Protocol 1 AND 2,
all four aggregation modes, all K steps) to <=1e-3 mm.

This catches flip handling, root-zeroing, window weighting, ragged-batch
accounting, action averaging and log formatting drift that no component
test can see.
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

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

# tiny-but-structurally-complete config: 2 actions x 4 cameras, sequence
# lengths that produce full windows + a right-aligned overlap window + a
# ragged final micro-batch
RF, CS, DEP, H, K, BS = 9, 64, 2, 3, 4, 2
ACTIONS = (("Walking 1", 21), ("Eating 1", 25))
SUBJECT = "S9"
JL = [4, 5, 6, 11, 12, 13]
JR = [1, 2, 3, 14, 15, 16]


def _build_fixture(root):
    """Synthetic H36M-format data_3d/data_2d npz pair + reference .bin."""
    rng = np.random.RandomState(42)
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir, exist_ok=True)

    # --- 3D world-coordinate positions, 32 joints (metres, near origin) ---
    positions = {}
    for action, T in ACTIONS:
        traj = np.cumsum(rng.randn(T, 1, 3) * 0.02, axis=0)
        traj += np.array([0.0, 0.0, 1.0])
        offsets = rng.randn(1, 32, 3) * 0.25
        wiggle = np.cumsum(rng.randn(T, 32, 3) * 0.01, axis=0)
        positions[action] = (traj + offsets + wiggle).astype(np.float32)
    path_3d = os.path.join(data_dir, "data_3d_h36m.npz")
    np.savez_compressed(path_3d, positions_3d={SUBJECT: positions})

    # --- 2D 'gt' keypoints: project the reduced 17-joint poses through the
    # real H36M cameras (pixel coordinates; both pipelines normalize) ---
    import jax.numpy as jnp
    from d3dp_tpu.data.h36m import Human36mDataset
    from d3dp_tpu.geometry.camera import world_to_camera, project_to_2d

    ds = Human36mDataset(path_3d)
    kps = {SUBJECT: {}}
    for action, _T in ACTIONS:
        per_cam = []
        for cam in ds.cameras()[SUBJECT]:
            p17 = ds[SUBJECT][action]["positions"]  # (T,17,3) world
            wc = np.asarray(
                world_to_camera(
                    jnp.asarray(p17), cam["orientation"], cam["translation"]
                )
            )
            T = wc.shape[0]
            p2n = np.asarray(
                project_to_2d(
                    jnp.asarray(wc.reshape(1, -1, 3)),
                    jnp.asarray(cam["intrinsic"][None]),
                )
            ).reshape(T, 17, 2)
            # normalized -> pixel coordinates (inverse of
            # normalize_screen_coordinates)
            w, h = cam["res_w"], cam["res_h"]
            px = (p2n + np.array([1.0, h / w])) * w / 2.0
            per_cam.append(px.astype(np.float32))
        kps[SUBJECT][action] = per_cam
    metadata = {
        "layout_name": "h36m",
        "num_joints": 17,
        "keypoints_symmetry": [
            list(ds.skeleton().joints_left()),
            list(ds.skeleton().joints_right()),
        ],
    }
    np.savez_compressed(
        os.path.join(data_dir, "data_2d_h36m_gt.npz"),
        positions_2d=kps,
        metadata=metadata,
    )

    # --- shared weights: a reference-format .bin from the torch model ---
    import torch

    ref_dp = import_reference("common.diffusionpose")
    torch.manual_seed(3)
    ref_args = types.SimpleNamespace(
        number_of_frames=RF, cs=CS, dep=DEP, timestep=1000, scale=1.0,
        test_time_augmentation=True,
    )
    model = ref_dp.D3DP(
        ref_args, JL, JR, is_train=False,
        num_proposals=H, sampling_timesteps=K,
    )
    for d in ("ckpt_ref", "ckpt_ours"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
        torch.save(
            {
                "epoch": 7,
                "lr": 6e-5,
                "random_state": None,
                "optimizer": None,
                "model_pos": model.state_dict(),
            },
            os.path.join(root, d, "parity.bin"),
        )


def _purge_reference_modules():
    """The reference keeps module-level state (e.g. the h36m_skeleton object
    that Human36mDataset.remove_joints MUTATES in place) — re-running its
    entry scripts in one process needs fresh 'common.*' modules."""
    for name in [m for m in sys.modules if m == "common"
                 or m.startswith("common.")]:
        del sys.modules[name]


class _Chdir:
    def __init__(self, path):
        self.path = path

    def __enter__(self):
        self.old = os.getcwd()
        os.chdir(self.path)

    def __exit__(self, *exc):
        os.chdir(self.old)


def _run_reference(root):
    """Execute the reference's main.py evaluate path; record noise draws.

    Returns the recorded draws grouped per model_eval call:
    [(img0 (n,H,RF,17,3), [K-1 step noises]), ...] in call order.
    """
    import torch

    import_reference("common.diffusionpose")  # installs cpu patches + timm
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
        "main.py", "-k", "gt", "-ste", SUBJECT, "-c", "ckpt_ref",
        "--evaluate", "parity.bin", "--nolog",
        "-f", str(RF), "-cs", str(CS), "-dep", str(DEP),
        "-num_proposals", str(H), "-sampling_timesteps", str(K),
        "-b", str(BS), "--p2", "-gpu", "",
    ]
    old_argv = sys.argv
    _purge_reference_modules()
    torch.randn, torch.randn_like = randn_rec, randn_like_rec
    try:
        sys.argv = argv
        with _Chdir(root):
            runpy.run_path(
                os.path.join(REFERENCE_PATH, "main.py"), run_name="__main__"
            )
    finally:
        sys.argv = old_argv
        torch.randn, torch.randn_like = orig_randn, orig_randn_like

    # group draws: each model_eval call = 1 img0 + (K-1) DDIM step noises,
    # all of shape (n, H, RF, 17, 3)
    groups = []
    i = 0
    while i < len(recorded):
        img0 = recorded[i]
        assert img0.ndim == 5 and img0.shape[1:] == (H, RF, 17, 3), (
            f"unexpected recorded draw shape {img0.shape} at {i}"
        )
        steps = recorded[i + 1 : i + K]
        assert all(s.shape == img0.shape for s in steps)
        groups.append((img0, steps))
        i += K
    return groups


def _run_ours(root, noise_groups):
    import jax
    import jax.numpy as jnp
    from d3dp_tpu.cli.arguments import parse_args
    from d3dp_tpu.cli.data_prep import prepare_data
    from d3dp_tpu.cli.main_h36m import _build_models, run_evaluation
    from d3dp_tpu.train.checkpoint_io import load_any

    args = parse_args([
        "-k", "gt", "-ste", SUBJECT, "-c", "ckpt_ours",
        "--evaluate", "parity.bin", "--nolog",
        "-f", str(RF), "-cs", str(CS), "-dep", str(DEP),
        "-num_proposals", str(H), "-sampling_timesteps", str(K),
        "-b", str(BS), "--p2",
    ])
    fifo = list(noise_groups)

    def provider(n):
        assert fifo, "our pipeline requested more noise than the reference drew"
        img0, steps = fifo.pop(0)
        assert img0.shape[0] == n, (
            f"batch mismatch: reference drew {img0.shape[0]} rows, ours has {n}"
        )
        noises = np.zeros((K,) + img0.shape, np.float32)
        for i, s in enumerate(steps):
            noises[i] = s
        return img0.astype(np.float32), noises

    with _Chdir(root):
        data = prepare_data(args)
        _, _, d3dp_eval = _build_models(args, data)
        ckpt = load_any(os.path.join("ckpt_ours", "parity.bin"), depth=DEP)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        run_evaluation(args, data, d3dp_eval, params, jax.random.PRNGKey(0),
                       noise_provider=provider)
    assert not fifo, f"{len(fifo)} reference noise groups were never consumed"


_ACTION_RE = re.compile(r"^----(.+)----$")
_STEP_RE = re.compile(
    r"^step (\d+) : Protocol #(\d) Error \(MPJPE\) (\w+): ([\d.]+) mm$"
)
_AVG_RE = re.compile(
    r"^step (\d+) Protocol #(\d)\s+\(MPJPE\) action-wise average "
    r"(\w+): ([\d.]+) mm$"
)


def _parse_log(path):
    """-> {(scope, protocol, step, mode): value_mm}."""
    out = {}
    scope = None
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            m = _ACTION_RE.match(line)
            if m and set(m.group(1)) != {"-"}:
                scope = m.group(1)
                continue
            m = _STEP_RE.match(line)
            if m:
                out[(scope, int(m.group(2)), int(m.group(1)), m.group(3))] = (
                    float(m.group(4))
                )
                continue
            m = _AVG_RE.match(line)
            if m:
                out[("average", int(m.group(2)), int(m.group(1)),
                     m.group(3))] = float(m.group(4))
    return out


@needs_ref
@pytest.mark.slow
def test_whole_pipeline_parity(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipeline_parity"))
    _build_fixture(root)

    noise_groups = _run_reference(root)
    # 2 actions x 4 cameras x ceil(3 windows / bs 2) batches = 16 calls
    assert len(noise_groups) == 16

    _run_ours(root, noise_groups)

    log_name = f"h36m_test_log_H{H}_K{K}.txt"
    ref = _parse_log(os.path.join(root, "ckpt_ref", log_name))
    ours = _parse_log(os.path.join(root, "ckpt_ours", log_name))

    # every cell present in both: 2 actions + average, 2 protocols, K steps,
    # 4 modes
    expected_cells = 3 * 2 * K * 4
    assert len(ref) == expected_cells, sorted(ref)
    assert set(ref) == set(ours), (
        set(ref) ^ set(ours)
    )
    worst = max(abs(ref[c] - ours[c]) for c in ref)
    bad = {c: (ref[c], ours[c]) for c in ref if abs(ref[c] - ours[c]) > 1e-3}
    print(f"whole-pipeline parity: {len(ref)} cells, worst |delta| = "
          f"{worst:.2e} mm")
    assert not bad, f"cells exceeding 1e-3 mm: {bad}"
