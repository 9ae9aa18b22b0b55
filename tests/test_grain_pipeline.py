"""Grain pipeline parity: byte-identical batches and RNG semantics vs the
plain ChunkedGenerator epoch iteration."""

import numpy as np
import pytest

pytest.importorskip("grain")

from d3dp_tpu.data.generators import ChunkedGenerator
from d3dp_tpu.data.grain_pipeline import GrainChunkedPipeline

KL, KR = [4, 5, 6], [1, 2, 3]


def make_gen(use_native, seed=1234):
    rng = np.random.RandomState(0)
    p3 = [rng.randn(n, 17, 3).astype(np.float32) for n in (40, 55, 23)]
    p2 = [rng.randn(n, 17, 2).astype(np.float32) for n in (40, 55, 23)]
    cams = [rng.randn(9).astype(np.float32) for _ in range(3)]
    return ChunkedGenerator(
        4, cams, p3, p2, 9, shuffle=True, random_seed=seed, augment=True,
        kps_left=KL, kps_right=KR, joints_left=KL, joints_right=KR,
        pad_last=True, use_native=use_native)


@pytest.mark.parametrize("use_native", [True, False])
def test_byte_identical_epochs(use_native):
    plain = make_gen(use_native)
    grain_gen = GrainChunkedPipeline(make_gen(use_native), num_threads=4)
    for _ in range(2):  # two epochs: shuffle order must stay in lockstep
        a = list(plain.next_epoch())
        b = list(grain_gen.next_epoch())
        assert len(a) == len(b) and len(a) > 1
        for ba, bb in zip(a, b):
            assert len(ba) == len(bb) == 4
            for xa, xb in zip(ba, bb):
                np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_rng_resume_contract():
    import pickle

    g1 = GrainChunkedPipeline(make_gen(True))
    list(g1.next_epoch())
    # checkpointing serialises the RandomState (a copy), reference
    # main.py:546 / generators.py:84-88
    state = pickle.loads(pickle.dumps(g1.random_state()))

    g2 = GrainChunkedPipeline(make_gen(True))
    g2.set_random_state(state)
    a = list(g1.next_epoch())
    b = list(g2.next_epoch())
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ba[2]), np.asarray(bb[2]))


def test_grain_with_sharded_to_device():
    """grain pipeline composes with the CLI's mesh to_device: batches come
    out dp-sharded (padded to the batch quantum) and numerically equal to
    the thread path."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    pytest.importorskip("grain")
    from jax.sharding import NamedSharding
    from d3dp_tpu.parallel import make_mesh, shard_batch_fn
    from d3dp_tpu.data.synthetic import make_dataset, JOINTS_LEFT, JOINTS_RIGHT
    from d3dp_tpu.data.generators import ChunkedGenerator
    from d3dp_tpu.data.grain_pipeline import GrainChunkedPipeline

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    cams, p3, p2 = make_dataset(seed=0, lengths=(120, 90))

    def gen():
        return ChunkedGenerator(
            6, cams, p3, p2, chunk_length=27, shuffle=True, augment=True,
            kps_left=JOINTS_LEFT, kps_right=JOINTS_RIGHT,
            joints_left=JOINTS_LEFT, joints_right=JOINTS_RIGHT,
            pad_last=True)

    sharded = list(GrainChunkedPipeline(
        gen(), to_device=shard_batch_fn(mesh)).next_epoch())
    plain = list(gen().next_epoch())
    assert len(sharded) == len(plain)
    for (c_s, b3_s, b2_s, w_s), (c_p, b3_p, b2_p, w_p) in zip(sharded, plain):
        assert isinstance(b3_s.sharding, NamedSharding)
        assert b3_s.shape[0] % 4 == 0  # padded to the dp quantum
        n = b3_p.shape[0]
        np.testing.assert_array_equal(np.asarray(b3_s)[:n], b3_p)
        np.testing.assert_array_equal(np.asarray(b2_s)[:n], b2_p)
        np.testing.assert_array_equal(np.asarray(w_s)[:n], w_p)
        assert float(np.sum(w_s)) == float(np.sum(w_p))  # pad rows weight 0
