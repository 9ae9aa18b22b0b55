"""Data layer: generator/windowing semantics + camera-constant parity."""

import numpy as np
import pytest

from d3dp_tpu.data.generators import ChunkedGenerator, UnchunkedGenerator
from d3dp_tpu.data.windowing import window_sequence, stitch_windows
from d3dp_tpu.data.skeleton import Skeleton
from d3dp_tpu.data.synthetic import make_dataset, JOINTS_LEFT, JOINTS_RIGHT
from tests.reference_oracle import reference_available, import_reference

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

KPS_L, KPS_R = JOINTS_LEFT, JOINTS_RIGHT


def small_data(rng, lengths=(10, 25, 7), J=17):
    cams = [rng.randn(9).astype(np.float32) for _ in lengths]
    p3 = [rng.randn(T, J, 3).astype(np.float32) for T in lengths]
    p2 = [rng.randn(T, J, 2).astype(np.float32) for T in lengths]
    return cams, p3, p2


class TestWindowing:
    @pytest.mark.parametrize("T,rf", [(20, 8), (16, 8), (5, 8), (8, 8), (243, 243), (700, 243)])
    def test_roundtrip(self, rng, T, rf):
        seq = rng.randn(T, 17, 3).astype(np.float32)
        w = window_sequence(seq, rf)
        expected_w = max(T // rf + (1 if T % rf else 0), 1)
        assert w.shape == (expected_w, rf, 17, 3)
        back = stitch_windows(w, T)
        np.testing.assert_array_equal(back, seq)

    def test_right_aligned_last_window(self, rng):
        seq = rng.randn(20, 3).astype(np.float32)
        w = window_sequence(seq, 8)
        np.testing.assert_array_equal(w[0], seq[0:8])
        np.testing.assert_array_equal(w[1], seq[8:16])
        np.testing.assert_array_equal(w[2], seq[12:20])  # right-aligned

    def test_short_replicate_pad(self, rng):
        seq = rng.randn(5, 3).astype(np.float32)
        w = window_sequence(seq, 8)
        assert w.shape == (1, 8, 3)
        np.testing.assert_array_equal(w[0, :5], seq)
        for i in range(5, 8):
            np.testing.assert_array_equal(w[0, i], seq[-1])  # edge replicate


@needs_ref
class TestGeneratorParity:
    def test_chunked_identical_batches(self, rng):
        ref_gen_mod = import_reference("common.generators")
        cams, p3, p2 = small_data(rng)
        kwargs = dict(
            chunk_length=8, pad=0, causal_shift=0, shuffle=True,
            random_seed=1234, augment=True,
            kps_left=KPS_L, kps_right=KPS_R,
            joints_left=KPS_L, joints_right=KPS_R,
        )
        ref = ref_gen_mod.ChunkedGenerator_Seq(
            4, [c.copy() for c in cams], [x.copy() for x in p3],
            [x.copy() for x in p2], **kwargs)
        ours = ChunkedGenerator(
            4, [c.copy() for c in cams], [x.copy() for x in p3],
            [x.copy() for x in p2], **kwargs)
        assert ref.batch_num() == ours.batch_num()

        ref_batches = [
            (c.copy(), b3.copy(), b2.copy()) for c, b3, b2 in ref.next_epoch()
        ]
        our_batches = list(ours.next_epoch())
        assert len(ref_batches) == len(our_batches)
        for (rc, r3, r2), (oc, o3, o2) in zip(ref_batches, our_batches):
            np.testing.assert_allclose(oc, rc, atol=1e-6)
            np.testing.assert_allclose(o3, r3, atol=1e-6)
            np.testing.assert_allclose(o2, r2, atol=1e-6)

    def test_chunked_pad_last_weights(self, rng):
        cams, p3, p2 = small_data(rng)
        gen = ChunkedGenerator(
            4, cams, p3, p2, chunk_length=8, shuffle=False, augment=False,
            pad_last=True)
        for batch in gen.next_epoch():
            c, b3, b2, w = batch
            assert b2.shape[0] == 4 and w.shape == (4,)
            assert set(np.unique(w)).issubset({0.0, 1.0})

    def test_unchunked_flip_augment(self, rng):
        ref_gen_mod = import_reference("common.generators")
        cams, p3, p2 = small_data(rng)
        kwargs = dict(
            pad=0, causal_shift=0, augment=False,
            kps_left=KPS_L, kps_right=KPS_R,
            joints_left=KPS_L, joints_right=KPS_R,
        )
        ref = ref_gen_mod.UnchunkedGenerator_Seq(cams, p3, p2, **kwargs)
        ours = UnchunkedGenerator(cams, p3, p2, **kwargs)
        ref.set_augment(True)
        ours.set_augment(True)
        for (rc, r3, r2), (oc, o3, o2) in zip(ref.next_epoch(), ours.next_epoch()):
            np.testing.assert_allclose(oc, rc, atol=1e-6)
            np.testing.assert_allclose(o3, r3, atol=1e-6)
            np.testing.assert_allclose(o2, r2, atol=1e-6)

    def test_resume_random_state(self, rng):
        """Checkpointed RNG state reproduces the exact shuffle order."""
        cams, p3, p2 = small_data(rng)
        mk = lambda: ChunkedGenerator(
            4, cams, p3, p2, chunk_length=8, shuffle=True, augment=True,
            kps_left=KPS_L, kps_right=KPS_R, joints_left=KPS_L,
            joints_right=KPS_R)
        g1 = mk()
        list(g1.next_epoch())  # advance one epoch
        import copy

        saved = copy.deepcopy(g1.random_state())  # checkpoint pickles a snapshot
        e2_first = [b[2].copy() for b in g1.next_epoch()]

        g2 = mk()
        g2.set_random_state(saved)
        e2_second = [b[2].copy() for b in g2.next_epoch()]
        for a, b in zip(e2_first, e2_second):
            np.testing.assert_array_equal(a, b)


@needs_ref
class TestH36MCameraParity:
    def test_camera_tables(self):
        """Transcribed calibration == reference's processed camera dicts."""
        import copy

        ref_ds = import_reference("common.h36m_dataset")
        ref_cam_mod = import_reference("common.camera")
        from d3dp_tpu.data.h36m import h36m_cameras

        # replicate the reference's normalisation on its own raw tables
        ref_cams = copy.deepcopy(ref_ds.h36m_cameras_extrinsic_params)
        for cameras in ref_cams.values():
            for i, cam in enumerate(cameras):
                cam.update(ref_ds.h36m_cameras_intrinsic_params[i])
                for k, v in cam.items():
                    if k not in ["id", "res_w", "res_h"]:
                        cam[k] = np.array(v, dtype="float32")
                cam["center"] = ref_cam_mod.normalize_screen_coordinates(
                    cam["center"], w=cam["res_w"], h=cam["res_h"]
                ).astype("float32")
                cam["focal_length"] = cam["focal_length"] / cam["res_w"] * 2
                if "translation" in cam:
                    cam["translation"] = cam["translation"] / 1000
                cam["intrinsic"] = np.concatenate(
                    (cam["focal_length"], cam["center"],
                     cam["radial_distortion"], cam["tangential_distortion"]))

        ours = h36m_cameras()
        assert set(ours.keys()) == set(ref_cams.keys())
        for subject in ref_cams:
            for rc, oc in zip(ref_cams[subject], ours[subject]):
                np.testing.assert_array_equal(oc["intrinsic"], rc["intrinsic"])
                if "translation" in rc:
                    np.testing.assert_array_equal(
                        oc["translation"], rc["translation"])
                    np.testing.assert_array_equal(
                        oc["orientation"], rc["orientation"])

    def test_skeleton_reduction(self):
        """32->17 joint reduction matches the reference skeleton."""
        ref_skel_mod = import_reference("common.skeleton")
        ref_ds = import_reference("common.h36m_dataset")
        from d3dp_tpu.data.h36m import h36m_skeleton, H36M_JOINTS_REMOVED

        ref_skel = ref_skel_mod.Skeleton(
            parents=[-1, 0, 1, 2, 3, 4, 0, 6, 7, 8, 9, 0, 11, 12, 13, 14, 12,
                     16, 17, 18, 19, 20, 19, 22, 12, 24, 25, 26, 27, 28, 27, 30],
            joints_left=[6, 7, 8, 9, 10, 16, 17, 18, 19, 20, 21, 22, 23],
            joints_right=[1, 2, 3, 4, 5, 24, 25, 26, 27, 28, 29, 30, 31],
        )
        ref_skel.remove_joints(H36M_JOINTS_REMOVED)
        ref_skel._parents[11] = 8
        ref_skel._parents[14] = 8

        ours = h36m_skeleton()
        ours.remove_joints(H36M_JOINTS_REMOVED)
        ours._parents[11] = 8
        ours._parents[14] = 8
        np.testing.assert_array_equal(ours.parents(), ref_skel.parents())
        assert ours.joints_left() == ref_skel.joints_left()
        assert ours.joints_right() == ref_skel.joints_right()
        # and these are the symmetry lists hard-wired into the diffusion cfg
        assert ours.joints_left() == JOINTS_LEFT
        assert ours.joints_right() == JOINTS_RIGHT


class TestSynthetic:
    def test_make_dataset(self):
        cams, p3, p2 = make_dataset(lengths=(50, 30))
        assert len(p3) == 2 and p3[0].shape == (50, 17, 3)
        assert p2[0].shape == (50, 17, 2)
        assert np.isfinite(p3[0]).all() and np.isfinite(p2[0]).all()
        # root-relative except trajectory in joint 0
        assert np.abs(p3[0][:, 1:]).max() < 3.0


@needs_ref
def test_seq2seq_generator_parity(rng):
    from d3dp_tpu.data.generators import UnchunkedGeneratorSeq2Seq

    ref_gen_mod = import_reference("common.generators")
    cams, p3, p2 = small_data(rng)
    kwargs = dict(
        pad=3, causal_shift=1, augment=False,
        kps_left=KPS_L, kps_right=KPS_R,
        joints_left=KPS_L, joints_right=KPS_R,
    )
    ref = ref_gen_mod.UnchunkedGenerator_Seq2Seq(cams, p3, p2, **kwargs)
    ours = UnchunkedGeneratorSeq2Seq(cams, p3, p2, **kwargs)
    ref.set_augment(True)
    ours.set_augment(True)
    for (rc, r3, r2), (oc, o3, o2) in zip(ref.next_epoch(), ours.next_epoch()):
        np.testing.assert_allclose(oc, rc, atol=1e-6)
        np.testing.assert_allclose(o3, r3, atol=1e-6)
        np.testing.assert_allclose(o2, r2, atol=1e-6)
