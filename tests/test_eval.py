"""Evaluator: batching invariance, quickdebug, sharded == unsharded."""

import numpy as np
import pytest
import jax

from d3dp_tpu.diffusion import D3DP, D3DPConfig
from d3dp_tpu.models import MixSTEConfig
from d3dp_tpu.data.generators import UnchunkedGenerator
from d3dp_tpu.data.synthetic import make_dataset, JOINTS_LEFT, JOINTS_RIGHT
from d3dp_tpu.eval import Evaluator

F = 27


def make_setup(rng_seed=0):
    d3dp = D3DP(
        D3DPConfig(
            model=MixSTEConfig(num_frames=F, embed_dim=64, depth=2),
            num_proposals=2,
            sampling_timesteps=2,
            joints_left=tuple(JOINTS_LEFT),
            joints_right=tuple(JOINTS_RIGHT),
        )
    )
    params = d3dp.init_params(jax.random.PRNGKey(rng_seed))
    cams, p3, p2 = make_dataset(seed=1, lengths=(100, 80))
    gen = lambda: UnchunkedGenerator(
        cams, p3, p2, kps_left=JOINTS_LEFT, kps_right=JOINTS_RIGHT,
        joints_left=JOINTS_LEFT, joints_right=JOINTS_RIGHT)
    return d3dp, params, gen


def test_result_shapes_and_modes():
    d3dp, params, gen = make_setup()
    ev = Evaluator(d3dp, receptive_field=F, batch_size=4,
                   kps_left=JOINTS_LEFT, kps_right=JOINTS_RIGHT, p2=True)
    res = ev.evaluate(params, gen(), jax.random.PRNGKey(0))
    avgs = res.averages_mm()
    assert set(avgs) == {"J_Best", "P_Best", "P_Agg", "J_Agg"}
    for v in avgs.values():
        assert v.shape == (2,) and np.isfinite(v).all()
    p2 = res.averages_p2_mm()
    for v in p2.values():
        assert v.shape == (2,) and np.isfinite(v).all()
    # J-Best oracle lower-bounds all other modes
    assert np.all(avgs["J_Best"] <= avgs["P_Best"] + 1e-9)
    assert np.all(avgs["J_Best"] <= avgs["J_Agg"] + 1e-9)


def test_sharded_matches_unsharded():
    """dp-sharded eval over the 8-device CPU mesh == single device."""
    from d3dp_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(dp=4, tp=2)

    d3dp, params, gen = make_setup()
    kw = dict(receptive_field=F, batch_size=4, kps_left=JOINTS_LEFT,
              kps_right=JOINTS_RIGHT)
    ev_single = Evaluator(d3dp, **kw)
    ev_shard = Evaluator(d3dp, mesh=mesh, **kw)
    r1 = ev_single.evaluate(params, gen(), jax.random.PRNGKey(3))
    r2 = ev_shard.evaluate(params, gen(), jax.random.PRNGKey(3))
    for m in ("J_Best", "P_Best", "P_Agg", "J_Agg"):
        np.testing.assert_allclose(
            r1.averages_mm()[m], r2.averages_mm()[m], rtol=1e-5)


def test_return_predictions():
    d3dp, params, gen = make_setup()
    ev = Evaluator(d3dp, receptive_field=F, batch_size=4,
                   kps_left=JOINTS_LEFT, kps_right=JOINTS_RIGHT)
    preds = ev.evaluate(params, gen(), jax.random.PRNGKey(0),
                        return_predictions=True)
    # first sequence = 100 frames -> 4 windows of 27 (-> one micro-batch)
    assert preds.shape == (4, 2, 2, F, 17, 3)


def test_sharded_noise_provider():
    """noise_provider + dp mesh: the (K, bs, ...) step-noise stack leads
    with the SAMPLING-STEP axis, so the dp sharding must land on axis 1 —
    with K=2 not divisible by dp=4 a leading-axis sharding would fail
    outright. Sharded replay must also equal unsharded replay."""
    from d3dp_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(dp=4, tp=2)

    d3dp, params, gen = make_setup()
    kw = dict(receptive_field=F, batch_size=4, kps_left=JOINTS_LEFT,
              kps_right=JOINTS_RIGHT)
    H, K = 2, 2

    def make_provider():
        def provider(n):
            img0 = rng_state.randn(4, H, F, 17, 3).astype(np.float32)
            steps = rng_state.randn(K, 4, H, F, 17, 3).astype(np.float32)
            return img0[:n].copy(), steps[:, :n].copy()
        rng_state = np.random.RandomState(11)
        return provider

    r1 = Evaluator(d3dp, **kw).evaluate(
        params, gen(), jax.random.PRNGKey(5), noise_provider=make_provider())
    r2 = Evaluator(d3dp, mesh=mesh, **kw).evaluate(
        params, gen(), jax.random.PRNGKey(5), noise_provider=make_provider())
    for m in ("J_Best", "P_Best", "P_Agg", "J_Agg"):
        np.testing.assert_allclose(
            r1.averages_mm()[m], r2.averages_mm()[m], rtol=1e-5)


def test_p2_device_matches_host():
    """--p2-device (jnp SVD inside the jitted step) matches the host numpy
    Protocol-2 path. fp32 LAPACK vs XLA SVD can differ at ~1e-4 on
    ill-conditioned poses (procrustes_np.py docstring), so the tolerance is
    loose in absolute mm but tight relative to the ~300 mm error scale.
    Padded rows must be excluded identically: 100+80 frames at F=27 give a
    final 3-window micro-batch padded to 4."""
    d3dp, params, gen = make_setup()
    kw = dict(receptive_field=F, batch_size=4, kps_left=JOINTS_LEFT,
              kps_right=JOINTS_RIGHT)
    r_host = Evaluator(d3dp, p2=True, **kw).evaluate(
        params, gen(), jax.random.PRNGKey(7))
    r_dev = Evaluator(d3dp, p2_device=True, **kw).evaluate(
        params, gen(), jax.random.PRNGKey(7))
    # identical sampling stream -> P1 numbers must agree exactly-ish
    for m in ("J_Best", "P_Best", "P_Agg", "J_Agg"):
        np.testing.assert_allclose(
            r_host.averages_mm()[m], r_dev.averages_mm()[m], rtol=1e-5)
    e_host, e_dev = r_host.averages_p2_mm(), r_dev.averages_p2_mm()
    assert set(e_host) == set(e_dev) == {"J_Best", "P_Best", "P_Agg", "J_Agg"}
    for m in e_host:
        np.testing.assert_allclose(e_host[m], e_dev[m], rtol=2e-3, atol=5e-3)
