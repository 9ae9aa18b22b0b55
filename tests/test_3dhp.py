"""3DHP path: pose-selection aggregation parity, mm-scaled metrics, harness
round-trip through .mat files, camera conversion."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from d3dp_tpu.eval.aggregation import (
    select_p_agg, select_p_best, select_j_best, select_j_agg)
from d3dp_tpu.data.mpi3dhp import cam_mm_to_pix, camera_for_sequence
from tests.reference_oracle import reference_available, import_reference

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

B, K, H, F, J = 2, 3, 4, 5, 17


@pytest.fixture
def stack(rng):
    preds = rng.randn(B, K, H, F, J, 3).astype(np.float32)
    target = rng.randn(B, F, J, 3).astype(np.float32)
    reproj = rng.randn(B, K, H, F, J, 2).astype(np.float32)
    target_2d = rng.randn(B, F, J, 2).astype(np.float32)
    return preds, target, reproj, target_2d


class TestSelections:
    def test_p_agg(self, stack):
        preds, *_ = stack
        out = np.asarray(select_p_agg(jnp.asarray(preds)))
        np.testing.assert_allclose(out, preds.mean(axis=2), atol=1e-6)

    def test_p_best_reference_semantics(self, stack):
        """P-Best picks ONE hypothesis per DDIM step for the whole batch
        (argmin of batch-mean error) — main_3dhp.py:787-797."""
        preds, target, *_ = stack
        errors = np.linalg.norm(preds - target[:, None, None], axis=-1)
        per_kh = errors.mean(axis=(0, 3, 4))  # (K,H)
        expected = np.stack(
            [preds[:, k, np.argmin(per_kh[k])] for k in range(K)], axis=1)
        out = np.asarray(select_p_best(jnp.asarray(preds), jnp.asarray(target)))
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_j_best_oracle(self, stack):
        preds, target, *_ = stack
        errors = np.linalg.norm(preds - target[:, None, None], axis=-1)
        idx = np.argmin(errors, axis=2)  # (B,K,F,J)
        expected = np.take_along_axis(
            preds, idx[:, :, None, :, :, None], axis=2)[:, :, 0]
        out = np.asarray(select_j_best(jnp.asarray(preds), jnp.asarray(target)))
        np.testing.assert_allclose(out, expected, atol=1e-6)
        # oracle selection error <= any single hypothesis error
        err_sel = np.linalg.norm(expected - target[:, None], axis=-1).mean()
        err_h0 = np.linalg.norm(preds[:, :, 0] - target[:, None], axis=-1).mean()
        assert err_sel <= err_h0 + 1e-6

    def test_j_agg(self, stack):
        preds, target, reproj, target_2d = stack
        errors_2d = np.linalg.norm(reproj - target_2d[:, None, None], axis=-1)
        idx = np.argmin(errors_2d, axis=2)
        expected = np.take_along_axis(
            preds, idx[:, :, None, :, :, None], axis=2)[:, :, 0]
        out = np.asarray(select_j_agg(
            jnp.asarray(preds), jnp.asarray(reproj), jnp.asarray(target_2d)))
        np.testing.assert_allclose(out, expected, atol=1e-6)


@needs_ref
class TestCameraParity:
    def test_cam_mm_to_pix(self):
        import torch

        # reference function requires a torch tensor and mutates in place
        sys_path_mod = import_reference("common.camera")  # ensure path set
        import importlib, sys

        # cam_mm_to_pix lives in main_3dhp.py (module-level script);
        # replicate inputs through our function and check against the
        # documented formula on both cameras
        for cam, cam_data in [
            (np.array([7.32506, 7.32506, -0.0322884, 0.0929296, 0, 0, 0, 0, 0]),
             [2048, 2048, 10, 10]),
            (np.array([8.770747185, 8.770747185, -0.104908645, 0.104899704,
                       0, 0, 0, 0, 0]),
             [1920, 1080, 10, 5.625]),
        ]:
            got = cam_mm_to_pix(cam, cam_data)
            mx, my = cam_data[0] / cam_data[2], cam_data[1] / cam_data[3]
            assert got[0] == pytest.approx(cam[0] * mx)
            assert got[1] == pytest.approx(cam[1] * my)
            assert got[2] == pytest.approx(cam[2] * mx + cam_data[0] / 2)
            assert got[3] == pytest.approx(cam[3] * my + cam_data[1] / 2)

    def test_camera_for_sequence(self):
        cam14, wh14 = camera_for_sequence("TS1")
        cam56, wh56 = camera_for_sequence("TS5")
        assert wh14 == (2048, 2048) and wh56 == (1920, 1080)
        assert cam14[0] == pytest.approx(7.32506 * 204.8)
        assert cam56[1] == pytest.approx(8.770747185 * 192.0)


class TestHarnessRoundtrip:
    def test_mat_roundtrip_with_known_errors(self, tmp_path, rng):
        """Export predictions with a KNOWN constant offset from GT through
        .mat files and verify the harness reports exactly that error."""
        import scipy.io as sio
        from d3dp_tpu.metrics.pck_auc import evaluate_3dhp_mat

        n_seq, Ftot, Kt = 2, 30, 2
        offset = 40.0  # mm, along x -> per-joint error == 40 exactly
        inference = {}
        for i in range(1, n_seq + 1):
            gt = rng.randn(3, 17, Ftot).astype(np.float64) * 100
            valid = np.ones(Ftot)
            valid[5:10] = 0
            acts = rng.randint(1, 8, Ftot)
            root_centred = gt - gt[:, 14:15, :]
            pred = np.stack([root_centred + np.array([offset, 0, 0])[:, None, None]
                             for _ in range(Kt)], axis=-1)
            inference[f"TS{i}"] = pred
            ts_dir = tmp_path / f"TS{i}"
            ts_dir.mkdir()
            sio.savemat(ts_dir / "annot_data.mat", {
                "annot3": gt, "valid_frame": valid,
                "activity_annotation": acts})

        summaries = evaluate_3dhp_mat(
            inference, str(tmp_path), "J_Best", str(tmp_path / "out"),
            n_seq=n_seq)
        for t in (1, 2):
            assert summaries[t]["mpjpe"] == pytest.approx(offset, abs=1e-9)
            assert summaries[t]["pck"] == pytest.approx(100.0)
        # CSVs written per timestep
        assert os.path.exists(
            tmp_path / "out" / "mpii_3dhp_evaluation_sequencewise_ori_J_Best_t1.csv")
        assert os.path.exists(
            tmp_path / "out" / "mpii_3dhp_evaluation_activitywise_ori_J_Best_t2.csv")
