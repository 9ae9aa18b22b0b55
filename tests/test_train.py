"""Training step: loss decreases on synthetic data; lr decay; sharded step
runs on a virtual 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from d3dp_tpu.diffusion import D3DP, D3DPConfig
from d3dp_tpu.models import MixSTEConfig
from d3dp_tpu.data.generators import ChunkedGenerator
from d3dp_tpu.data.synthetic import make_dataset, JOINTS_LEFT, JOINTS_RIGHT
from d3dp_tpu.train.state import (
    TrainState,
    make_optimizer,
    make_train_step,
    get_lr,
    set_lr,
)

F = 27  # tiny receptive field for fast tests


def tiny_d3dp():
    return D3DP(
        D3DPConfig(
            model=MixSTEConfig(num_frames=F, embed_dim=64, depth=2,
                               drop_path_rate=0.1),
            num_proposals=2,
            sampling_timesteps=2,
            joints_left=tuple(JOINTS_LEFT),
            joints_right=tuple(JOINTS_RIGHT),
        )
    )


def test_loss_decreases():
    d3dp = tiny_d3dp()
    params = d3dp.init_params(jax.random.PRNGKey(0))
    tx = make_optimizer(3e-4)
    state = TrainState.create(params, tx)
    step = make_train_step(d3dp, tx, donate=False)

    cams, p3, p2 = make_dataset(seed=0, lengths=(200, 150))
    gen = ChunkedGenerator(
        8, cams, p3, p2, chunk_length=F, shuffle=True, augment=True,
        kps_left=JOINTS_LEFT, kps_right=JOINTS_RIGHT,
        joints_left=JOINTS_LEFT, joints_right=JOINTS_RIGHT, pad_last=True,
    )

    losses = []
    key = jax.random.PRNGKey(42)
    for epoch in range(4):
        epoch_losses = []
        for cam, b3, b2, w in gen.next_epoch():
            key, sub = jax.random.split(key)
            state, loss = step(state, sub, jnp.asarray(b2), jnp.asarray(b3),
                               jnp.asarray(w))
            epoch_losses.append(float(loss))
        losses.append(np.mean(epoch_losses))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses


def test_lr_decay():
    d3dp = tiny_d3dp()
    params = d3dp.init_params(jax.random.PRNGKey(0))
    tx = make_optimizer(6e-5)
    state = TrainState.create(params, tx)
    assert abs(get_lr(state.opt_state) - 6e-5) < 1e-9
    new_opt = set_lr(state.opt_state, get_lr(state.opt_state) * 0.993)
    assert abs(get_lr(new_opt) - 6e-5 * 0.993) < 1e-9


def test_sharded_train_step():
    """Data-parallel x tensor-parallel step on the 8-device CPU mesh."""
    from d3dp_tpu.parallel import make_mesh, batch_sharding, shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(dp=4, tp=2)

    d3dp = tiny_d3dp()
    params = d3dp.init_params(jax.random.PRNGKey(0))
    tx = make_optimizer(3e-4)

    sharded = {"params": shard_params(params["params"], mesh)}
    state = TrainState.create(sharded, tx)
    step = make_train_step(d3dp, tx, donate=False)

    rng = np.random.RandomState(0)
    B = 8
    x2d = jax.device_put(
        jnp.asarray(rng.randn(B, F, 17, 2), jnp.float32), batch_sharding(mesh))
    x3d = jax.device_put(
        jnp.asarray(rng.randn(B, F, 17, 3), jnp.float32), batch_sharding(mesh))
    w = jax.device_put(jnp.ones((B,), jnp.float32), batch_sharding(mesh))

    state2, loss = step(state, jax.random.PRNGKey(1), x2d, x3d, w)
    assert np.isfinite(float(loss))

    # parity: sharded step == single-device step (same rng, same data)
    state_r = TrainState.create(params, tx)
    _, loss_r = step(state_r, jax.random.PRNGKey(1),
                     jnp.asarray(np.asarray(x2d)), jnp.asarray(np.asarray(x3d)),
                     jnp.ones((B,), jnp.float32))
    assert abs(float(loss) - float(loss_r)) < 1e-5


def test_bf16_training_decreases_loss():
    """bf16 compute with fp32 params: the TPU-native fast training path."""
    d3dp = D3DP(
        D3DPConfig(
            model=MixSTEConfig(num_frames=F, embed_dim=64, depth=2,
                               dtype=jnp.bfloat16),
            num_proposals=2, sampling_timesteps=2,
            joints_left=tuple(JOINTS_LEFT), joints_right=tuple(JOINTS_RIGHT),
        )
    )
    params = d3dp.init_params(jax.random.PRNGKey(0))
    # params stay fp32 regardless of compute dtype
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(params))
    tx = make_optimizer(3e-4)
    state = TrainState.create(params, tx)
    step = make_train_step(d3dp, tx, donate=False)

    cams, p3, p2 = make_dataset(seed=0, lengths=(200,))
    gen = ChunkedGenerator(
        8, cams, p3, p2, chunk_length=F, shuffle=True, augment=True,
        kps_left=JOINTS_LEFT, kps_right=JOINTS_RIGHT,
        joints_left=JOINTS_LEFT, joints_right=JOINTS_RIGHT, pad_last=True)
    key = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(4):
        ep = []
        for cam, b3, b2, w in gen.next_epoch():
            key, sub = jax.random.split(key)
            state, loss = step(state, sub, jnp.asarray(b2), jnp.asarray(b3),
                               jnp.asarray(w))
            ep.append(float(loss))
        losses.append(np.mean(ep))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
