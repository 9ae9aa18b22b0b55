"""DropPath (stochastic depth) on the fused Pallas path.

The reference TRAINS with drop_path_rate=0.1 (diffusionpose.py:121-123,
mixste.py:114-115: the same DropPath applied to both residual branches,
fresh mask per call). Until r4 the fused two-kernel-per-block path only
engaged when DropPath was inactive, so the train forward ran the composed
path; these tests pin the r4 per-row-scale kernels (attention_stage_dp_p,
mlp_block[_t]_dp_p) against the composed XLA path with IDENTICAL masks —
Block draws the masks itself (Block._droppath_masks) so both paths consume
the same bernoulli draws given the same rng.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from d3dp_tpu.models import MixSTE2, MixSTEConfig


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _mk(impl, lvl, dpr):
    return MixSTE2(MixSTEConfig(
        num_frames=9, embed_dim=64, depth=2, attention_impl=impl,
        fuse_level=lvl, drop_path_rate=dpr))


def _data(rng, B=3, F=9, J=17):
    x2d = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(B, F, J, 3), jnp.float32)
    t = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)
    return x2d, x3d, t


def test_train_forward_fused_matches_composed(rng, monkeypatch):
    """fp32 train-mode forward, drop_path_rate=0.5: the fused dp kernels
    produce the same output as the composed XLA path under the same
    dropout rng (the masks are drawn identically in Block).

    D3DP_TRAIN_FUSED=1: since r4c measured the fused stage kernels' custom
    VJP 37% slower than composed autodiff at train shapes, the TRAINING
    forward defaults to the composed path — the dp kernels are opt-in and
    these tests pin them against the default."""
    monkeypatch.setenv("D3DP_TRAIN_FUSED", "1")
    x2d, x3d, t = _data(rng)
    params = _mk("xla", 0, 0.5).init(jax.random.PRNGKey(0), x2d, x3d, t)
    rngs = {"dropout": jax.random.PRNGKey(7)}
    want = _mk("xla", 0, 0.5).apply(params, x2d, x3d, t,
                                    deterministic=False, rngs=rngs)
    got = _mk("pallas", 4, 0.5).apply(params, x2d, x3d, t,
                                      deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # and the masks actually bite: a different rng changes the output
    other = _mk("pallas", 4, 0.5).apply(
        params, x2d, x3d, t, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(8)})
    assert not np.allclose(np.asarray(got), np.asarray(other))


def test_train_grads_fused_match_composed(rng, monkeypatch):
    """Whole-model gradients through the dp kernels' custom VJPs equal the
    composed path's autodiff under the same masks (fp32)."""
    monkeypatch.setenv("D3DP_TRAIN_FUSED", "1")
    x2d, x3d, t = _data(rng, B=2)
    params = _mk("xla", 0, 0.5).init(jax.random.PRNGKey(0), x2d, x3d, t)
    rngs = {"dropout": jax.random.PRNGKey(3)}

    def loss(impl, lvl, p):
        out = _mk(impl, lvl, 0.5).apply(p, x2d, x3d, t,
                                        deterministic=False, rngs=rngs)
        return jnp.mean(jnp.square(out))

    g_ref = jax.grad(lambda p: loss("xla", 0, p))(params)
    g_dp = jax.grad(lambda p: loss("pallas", 4, p))(params)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_dp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4,
                                   err_msg=str(ka))


def test_eval_path_unaffected(rng):
    """deterministic=True ignores drop_path entirely: fused output equals
    the dpr=0 fused output bit-for-bit (no dp kernel engaged)."""
    x2d, x3d, t = _data(rng)
    params = _mk("xla", 0, 0.5).init(jax.random.PRNGKey(0), x2d, x3d, t)
    a = _mk("pallas", 4, 0.5).apply(params, x2d, x3d, t, deterministic=True)
    b = _mk("pallas", 4, 0.0).apply(params, x2d, x3d, t, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_train_step_with_dp_kernels(rng, monkeypatch):
    """The dp-fused training path under a dp x tp mesh: sharded train step
    == unsharded (same rng => same DropPath masks), pallas fuse-4."""
    monkeypatch.setenv("D3DP_TRAIN_FUSED", "1")
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.parallel import batch_sharding, make_mesh, shard_params
    from d3dp_tpu.train.state import TrainState, make_optimizer, make_train_step

    F, J = 9, 17
    d3dp = D3DP(D3DPConfig(
        model=MixSTEConfig(num_frames=F, embed_dim=64, depth=2,
                           drop_path_rate=0.2, attention_impl="pallas",
                           fuse_level=4),
        num_proposals=2, sampling_timesteps=2))
    params = d3dp.init_params(jax.random.PRNGKey(0))
    tx = make_optimizer(1e-4)
    step = make_train_step(d3dp, tx, donate=False)

    B = 4
    x2d = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(B, F, J, 3), jnp.float32)
    w = jnp.ones((B,), jnp.float32)

    state_u = TrainState.create(params, tx)
    state_u, loss_u = step(state_u, jax.random.PRNGKey(1), x2d, x3d, w)

    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    bs = batch_sharding(mesh)
    sharded = {"params": shard_params(params["params"], mesh)}
    state_s = TrainState.create(sharded, tx, mesh=mesh)
    state_s, loss_s = step(state_s, jax.random.PRNGKey(1),
                           jax.device_put(x2d, bs), jax.device_put(x3d, bs),
                           jax.device_put(w, bs))
    assert abs(float(loss_s) - float(loss_u)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(state_u.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_attention_stage_dp_kernel(rng):
    """Ops-level: attention_stage_dp_p == unscaled stage recombined with the
    per-row scale (x2 = x + s*(x2_base - x); y2 = LN2(x2))."""
    from d3dp_tpu.ops.attention import attention_stage_dp_p, attention_stage_p

    B, N, C, h = 6, 17, 64, 4
    x = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.randn(3 * C) * 0.01, jnp.float32)
    wp = jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.randn(C) * 0.01, jnp.float32)
    ones, zeros = jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)
    s = jnp.asarray(rng.rand(B) * 2.0, jnp.float32)

    x2b, _ = attention_stage_p(x, wqkv, bqkv, wp, bp, ones, zeros, ones,
                               zeros, h, 0.125, 1e-6)
    x2 = x + s[:, None, None] * (x2b - x)
    mu = x2.mean(-1, keepdims=True)
    var = jnp.square(x2 - mu).mean(-1, keepdims=True)
    y2 = (x2 - mu) * jax.lax.rsqrt(var + 1e-6)

    gx2, gy2 = attention_stage_dp_p(x, wqkv, bqkv, wp, bp, ones, zeros,
                                    ones, zeros, s, h, 0.125, 1e-6)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(x2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gy2), np.asarray(y2), atol=2e-5)


def test_attention_stage_dp_kernel_batched_variant(rng):
    """Ops-level at N=128: the temporal stage's default `batched` variant
    (head-major scratch AFTER the dp ref in the kernel's *args) with
    DropPath — the production TRAIN config runs exactly batched+dp, but
    every other test here uses N<128 where the variant is ''. Pins the
    dp/scratch unpack ordering fwd + bwd against the unscaled stage
    recombination (same identity as test_attention_stage_dp_kernel)."""
    from d3dp_tpu.ops.attention import attention_stage_dp_p, attention_stage_p

    B, N, C, h = 4, 128, 64, 4
    x = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.randn(3 * C) * 0.01, jnp.float32)
    wp = jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.randn(C) * 0.01, jnp.float32)
    ones, zeros = jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)
    s = jnp.asarray(rng.rand(B) * 2.0, jnp.float32)

    def via_unscaled(x):
        x2b, _ = attention_stage_p(x, wqkv, bqkv, wp, bp, ones, zeros, ones,
                                   zeros, h, 0.125, 1e-6)
        x2 = x + s[:, None, None] * (x2b - x)
        mu = x2.mean(-1, keepdims=True)
        var = jnp.square(x2 - mu).mean(-1, keepdims=True)
        return x2, (x2 - mu) * jax.lax.rsqrt(var + 1e-6)

    x2, y2 = via_unscaled(x)
    gx2, gy2 = attention_stage_dp_p(x, wqkv, bqkv, wp, bp, ones, zeros,
                                    ones, zeros, s, h, 0.125, 1e-6)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(x2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gy2), np.asarray(y2), atol=2e-5)

    g_dp = jax.grad(lambda a: jnp.sum(jnp.square(attention_stage_dp_p(
        a, wqkv, bqkv, wp, bp, ones, zeros, ones, zeros, s, h, 0.125,
        1e-6)[1])))(x)
    g_ref = jax.grad(lambda a: jnp.sum(jnp.square(via_unscaled(a)[1])))(x)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_ref), atol=2e-4)


def test_mlp_dp_kernels(rng):
    """Ops-level: both mlp dp kernels against explicit XLA math, and their
    VJPs against autodiff of that math."""
    from d3dp_tpu.ops.mlp import mlp_block_dp_p, mlp_block_t_dp_p

    C, H = 64, 128
    R = 12
    x = jnp.asarray(rng.randn(R, C), jnp.float32)
    res = jnp.asarray(rng.randn(R, C), jnp.float32)
    w1 = jnp.asarray(rng.randn(C, H) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(H) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(H, C) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(C) * 0.01, jnp.float32)
    lns = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    lnb = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    s = jnp.asarray(rng.rand(R) * 2.0, jnp.float32)

    def ref_flat(x, res, w1, b1, w2, b2):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        sf = res + s[:, None] * (h @ w2 + b2)
        mu = sf.mean(-1, keepdims=True)
        var = jnp.square(sf - mu).mean(-1, keepdims=True)
        return ((sf - mu) * jax.lax.rsqrt(var + 1e-6)) * lns + lnb

    got = mlp_block_dp_p(x, res, w1, b1, w2, b2, lns, lnb, s, 1e-6)
    want = ref_flat(x, res, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    gk = jax.grad(lambda *a: jnp.sum(jnp.square(
        mlp_block_dp_p(*a, lns, lnb, s, 1e-6))), argnums=(0, 1, 2, 3, 4, 5))(
        x, res, w1, b1, w2, b2)
    gr = jax.grad(lambda *a: jnp.sum(jnp.square(ref_flat(*a))),
                  argnums=(0, 1, 2, 3, 4, 5))(x, res, w1, b1, w2, b2)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    # transposing layout: (B0, D1, D2, C), dp per (B0, D1) row
    B0, D1, D2 = 2, 3, 5
    xt = jnp.asarray(rng.randn(B0, D1, D2, C), jnp.float32)
    rt = jnp.asarray(rng.randn(B0, D1, D2, C), jnp.float32)
    st = jnp.asarray(rng.rand(B0, D1) * 2.0, jnp.float32)

    def ref_t(xt, rt):
        h = jax.nn.gelu(xt @ w1 + b1, approximate=False)
        sf = rt + st[:, :, None, None] * (h @ w2 + b2)
        mu = sf.mean(-1, keepdims=True)
        var = jnp.square(sf - mu).mean(-1, keepdims=True)
        out = ((sf - mu) * jax.lax.rsqrt(var + 1e-6)) * lns + lnb
        return jnp.swapaxes(out, 1, 2)

    got_t = mlp_block_t_dp_p(xt, rt, w1, b1, w2, b2, lns, lnb, st, 1e-6)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t(xt, rt)),
                               atol=2e-5)
    gk = jax.grad(lambda a, b: jnp.sum(jnp.square(
        mlp_block_t_dp_p(a, b, w1, b1, w2, b2, lns, lnb, st, 1e-6))),
        argnums=(0, 1))(xt, rt)
    gr = jax.grad(lambda a, b: jnp.sum(jnp.square(ref_t(a, b))),
                  argnums=(0, 1))(xt, rt)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
