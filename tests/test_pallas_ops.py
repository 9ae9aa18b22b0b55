"""Pallas kernels vs their XLA equivalents (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from d3dp_tpu.ops.attention import fused_attention, fused_attention_qkv
from d3dp_tpu.models.mixste import MixSTE2, MixSTEConfig


def ref_attn(q, k, v, scale):
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   precision="highest").astype(jnp.float32) * scale
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", a, v, precision="highest")


@pytest.mark.parametrize("B,N", [(24, 17), (8, 243)])
def test_fused_attention_parity(rng, B, N):
    h, d = 8, 64
    q = jnp.asarray(rng.randn(B, N, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, h, d), jnp.float32)
    scale = d**-0.5
    out = fused_attention(q, k, v, scale, interpret=True)
    expected = ref_attn(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=2e-5)


def test_fused_attention_qkv_parity(rng):
    B, N, h, d = 16, 17, 8, 64
    C = h * d
    qkv = jnp.asarray(rng.randn(B, N, 3 * C), jnp.float32)
    scale = d**-0.5
    out = fused_attention_qkv(qkv, h, scale, interpret=True)
    qkv5 = qkv.reshape(B, N, 3, h, d)
    expected = ref_attn(qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2], scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected).reshape(B, N, C), atol=2e-5)


def test_model_pallas_vs_xla(rng):
    """Whole MixSTE2 forward: pallas attention == xla attention (fp32)."""
    from d3dp_tpu.models import MixSTE2, MixSTEConfig

    B, F, J = 2, 9, 17
    x2d = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(B, F, J, 3), jnp.float32)
    t = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)
    mk = lambda impl: MixSTE2(MixSTEConfig(
        num_frames=F, embed_dim=64, depth=2, attention_impl=impl))
    params = mk("xla").init(jax.random.PRNGKey(0), x2d, x3d, t)
    out_x = mk("xla").apply(params, x2d, x3d, t)
    out_p = mk("pallas").apply(params, x2d, x3d, t)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-4)


def test_fused_attention_grad_parity(rng):
    """custom-VJP backward == autodiff through the XLA attention."""
    from d3dp_tpu.ops.attention import fused_attention_qkv_ad

    B, N, h, d = 6, 17, 8, 64
    C = h * d
    qkv = jnp.asarray(rng.randn(B, N, 3 * C) * 0.5, jnp.float32)
    cot = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    scale = d**-0.5

    def xla_attn(qkv):
        q5 = qkv.reshape(B, N, 3, h, d)
        return ref_attn(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2],
                        scale).reshape(B, N, C)

    def loss_p(qkv):
        return jnp.sum(fused_attention_qkv_ad(qkv, h, scale) * cot)

    def loss_x(qkv):
        return jnp.sum(xla_attn(qkv) * cot)

    g_p = jax.grad(loss_p)(qkv)
    g_x = jax.grad(loss_x)(qkv)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=3e-4)


def test_model_grad_pallas_vs_xla(rng):
    """Whole-model gradients agree between attention impls (fp32)."""
    from d3dp_tpu.models import MixSTE2, MixSTEConfig

    B, F, J = 2, 9, 17
    x2d = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(B, F, J, 3), jnp.float32)
    t = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)
    mk = lambda impl: MixSTE2(MixSTEConfig(
        num_frames=F, embed_dim=64, depth=2, attention_impl=impl))
    params = mk("xla").init(jax.random.PRNGKey(0), x2d, x3d, t)

    def loss(impl, p):
        return jnp.mean(jnp.square(mk(impl).apply(p, x2d, x3d, t)))

    g_x = jax.grad(lambda p: loss("xla", p))(params)
    g_p = jax.grad(lambda p: loss("pallas", p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_x),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_mlp_tile_partial_blocks(rng):
    """The 128-frame default MLP tile leaves a PARTIAL last block at the
    243-frame flagship shape (cdiv grid) — pin correctness of the masked
    tail in both layouts against the XLA reference math."""
    from d3dp_tpu.ops.mlp import _mlp_block_t_fwd

    C, H = 64, 128
    for (B0, D1, D2) in [(2, 150, 5), (2, 5, 150)]:
        x = jnp.asarray(rng.randn(B0, D1, D2, C), jnp.float32)
        res = jnp.asarray(rng.randn(B0, D1, D2, C), jnp.float32)
        w1 = jnp.asarray(rng.randn(C, H) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.randn(H) * 0.01, jnp.float32)
        w2 = jnp.asarray(rng.randn(H, C) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.randn(C) * 0.01, jnp.float32)
        s = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

        got = _mlp_block_t_fwd(x, res, w1, b1, w2, b2, s, b, 1e-6, tile=128)

        xf = x.astype(jnp.float32)
        h = jax.nn.gelu(xf @ w1 + b1, approximate=False)
        sfull = res + h @ w2 + b2
        mu = sfull.mean(-1, keepdims=True)
        var = jnp.square(sfull - mu).mean(-1, keepdims=True)
        want = ((sfull - mu) * jax.lax.rsqrt(var + 1e-6)) * s + b
        want = jnp.swapaxes(want, 1, 2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("lvl", [0, 2, 3, 4])
def test_fuse_levels_agree(rng, lvl):
    """Every wired fusion level computes the same forward (fp32, vs the XLA
    reference path). Levels: 0=attention kernel only, 2=stage kernels,
    3=+transpose-free flow, 4=+LN1/qkv folded into the attention stage."""
    B, F, J = 3, 9, 17
    x2d = jnp.asarray(rng.randn(B, F, J, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(B, F, J, 3), jnp.float32)
    t = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)
    mk = lambda impl, lv: MixSTE2(MixSTEConfig(
        num_frames=F, embed_dim=64, depth=2, attention_impl=impl,
        fuse_level=lv))
    params = mk("xla", 0).init(jax.random.PRNGKey(0), x2d, x3d, t)
    expected = np.asarray(mk("xla", 0).apply(params, x2d, x3d, t))
    got = np.asarray(mk("pallas", lvl).apply(params, x2d, x3d, t))
    np.testing.assert_allclose(got, expected, atol=1e-4)


@pytest.mark.parametrize("variant", ["bf16exp", "batched", "pipelined",
                                     "phasesplit", "hmqkv"])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_stage_kernel_variants_agree(rng, variant, dtype, monkeypatch):
    """Kernel-lab attention-stage variants (D3DP_ATTN_VARIANT) match the
    production per-head loop in interpret mode. bf16exp only reorders the
    bf16 softmax rounding, so it gets a loose bf16 tolerance; `batched`,
    `pipelined` and `phasesplit` compute identical math (reordered /
    restacked, not renumbered); `hmqkv` splits the out-projection into
    per-head partial sums, which reorders fp32 accumulation (tiny atol)."""
    from d3dp_tpu.ops import attention as A

    if variant == "bf16exp" and dtype == "float32":
        pytest.skip("bf16exp only engages on the bf16 path")
    dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
    B, N, C, h = 4, 9, 64, 4
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, dt)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.1, dt)
    bqkv = jnp.asarray(rng.randn(3 * C) * 0.01, dt)
    wp = jnp.asarray(rng.randn(C, C) * 0.1, dt)
    bp = jnp.asarray(rng.randn(C) * 0.01, dt)
    s1, b1 = jnp.ones((C,), dt), jnp.zeros((C,), dt)
    s2, b2 = jnp.ones((C,), dt), jnp.zeros((C,), dt)
    arg = (x, wqkv, bqkv, wp, bp, s1, b1, s2, b2, h, 0.125, 1e-6)

    def run():
        A._attention_stage_fwd.clear_cache()  # env is trace-time state
        x2, y2 = A._attention_stage_fwd(*arg, tb=2)
        return np.asarray(x2, np.float32), np.asarray(y2, np.float32)

    monkeypatch.delenv("D3DP_ATTN_VARIANT", raising=False)
    base_x2, base_y2 = run()
    monkeypatch.setenv("D3DP_ATTN_VARIANT", variant)
    var_x2, var_y2 = run()
    monkeypatch.delenv("D3DP_ATTN_VARIANT", raising=False)
    A._attention_stage_fwd.clear_cache()

    if dtype == "float32":
        atol = 1e-5 if variant == "hmqkv" else 0.0
    else:
        atol = 5e-2
    np.testing.assert_allclose(var_x2, base_x2, atol=atol)
    np.testing.assert_allclose(var_y2, base_y2, atol=atol)


def test_stage_variant_per_stage_selection(monkeypatch):
    """Per-stage variant resolution: _T engages for n_tokens>=128, _S
    below; each falls back to the global D3DP_ATTN_VARIANT; an explicitly
    EMPTY stage env pins that stage to the default even when the global
    selects a variant (how batched ships temporal-only)."""
    from d3dp_tpu.ops.attention import _stage_variant

    for env in ("D3DP_ATTN_VARIANT", "D3DP_ATTN_VARIANT_T",
                "D3DP_ATTN_VARIANT_S"):
        monkeypatch.delenv(env, raising=False)
    # r3 promoted default: temporal runs batched, spatial the loop
    assert _stage_variant(243) == "batched" and _stage_variant(17) == ""

    monkeypatch.setenv("D3DP_ATTN_VARIANT_T", "loop")
    assert _stage_variant(243) == "loop"     # opt-out forces the loop
    monkeypatch.setenv("D3DP_ATTN_VARIANT_T", "batched")
    assert _stage_variant(243) == "batched"
    assert _stage_variant(17) == ""          # _T does not leak to spatial
    assert _stage_variant() == ""            # no n_tokens -> global only

    monkeypatch.setenv("D3DP_ATTN_VARIANT", "bf16exp")
    assert _stage_variant(17) == "bf16exp"   # falls back to the global
    assert _stage_variant(243) == "batched"  # _T still wins over global
    monkeypatch.delenv("D3DP_ATTN_VARIANT_T", raising=False)
    assert _stage_variant(243) == "bf16exp"  # global set: no promotion

    monkeypatch.setenv("D3DP_ATTN_VARIANT_S", "")
    assert _stage_variant(17) == ""          # explicit empty beats global


def test_stage_variant_per_stage_override_e2e(rng, monkeypatch):
    """End-to-end: a global `noy2` (which skips the y2 write) is defeated
    for the spatial-classified shape by an explicitly empty _S override,
    and `_T=noy2` does not engage at N=9 — both runs must reproduce the
    default-path y2 exactly."""
    from d3dp_tpu.ops import attention as A

    B, N, C, h = 4, 9, 64, 4  # N=9 -> spatial classification
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.randn(3 * C) * 0.01, jnp.float32)
    wp = jnp.asarray(rng.randn(C, C) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.randn(C) * 0.01, jnp.float32)
    s1, b1 = jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)
    arg = (x, wqkv, bqkv, wp, bp, s1, b1, s1, b1, h, 0.125, 1e-6)

    def run():
        A._attention_stage_fwd.clear_cache()
        _, y2 = A._attention_stage_fwd(*arg, tb=2)
        return np.asarray(y2, np.float32)

    for env in ("D3DP_ATTN_VARIANT", "D3DP_ATTN_VARIANT_T",
                "D3DP_ATTN_VARIANT_S"):
        monkeypatch.delenv(env, raising=False)
    base_y2 = run()
    assert np.abs(base_y2).max() > 0

    monkeypatch.setenv("D3DP_ATTN_VARIANT_T", "noy2")  # wrong stage: no-op
    np.testing.assert_allclose(run(), base_y2, atol=0.0)

    monkeypatch.setenv("D3DP_ATTN_VARIANT", "noy2")    # global engages...
    monkeypatch.setenv("D3DP_ATTN_VARIANT_S", "")      # ...but _S pins it
    np.testing.assert_allclose(run(), base_y2, atol=0.0)

    for env in ("D3DP_ATTN_VARIANT", "D3DP_ATTN_VARIANT_T",
                "D3DP_ATTN_VARIANT_S"):
        monkeypatch.delenv(env, raising=False)
    A._attention_stage_fwd.clear_cache()


@pytest.mark.parametrize("variant", ["", "pipelined", "phasesplit"])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_spatial_group_agrees(rng, variant, dtype, monkeypatch):
    """Grouped spatial attention (D3DP_SPATIAL_GROUP): folding g sequences
    into one (g*N)-token attention with a block-diagonal mask matches the
    ungrouped stage — the mask zeroes cross-sequence probabilities exactly,
    so only the softmax-normaliser reduction width differs (fp noise)."""
    from d3dp_tpu.ops import attention as A

    dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
    B, N, C, h, g = 12, 9, 64, 4, 3
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, dt)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.1, dt)
    bqkv = jnp.asarray(rng.randn(3 * C) * 0.01, dt)
    wp = jnp.asarray(rng.randn(C, C) * 0.1, dt)
    bp = jnp.asarray(rng.randn(C) * 0.01, dt)
    s1, b1 = jnp.ones((C,), dt), jnp.zeros((C,), dt)
    arg = (x, wqkv, bqkv, wp, bp, s1, b1, s1, b1, h, 0.125, 1e-6)

    def run():
        A._attention_stage_fwd.clear_cache()
        x2, y2 = A._attention_stage_fwd(*arg, tb=2)
        return np.asarray(x2, np.float32), np.asarray(y2, np.float32)

    monkeypatch.delenv("D3DP_SPATIAL_GROUP", raising=False)
    if variant:
        monkeypatch.setenv("D3DP_ATTN_VARIANT", variant)
    else:
        monkeypatch.delenv("D3DP_ATTN_VARIANT", raising=False)
    base_x2, base_y2 = run()
    monkeypatch.setenv("D3DP_SPATIAL_GROUP", str(g))
    grp_x2, grp_y2 = run()
    monkeypatch.delenv("D3DP_SPATIAL_GROUP", raising=False)
    monkeypatch.delenv("D3DP_ATTN_VARIANT", raising=False)
    A._attention_stage_fwd.clear_cache()

    atol = 1e-5 if dtype == "float32" else 5e-2
    np.testing.assert_allclose(grp_x2, base_x2, atol=atol)
    np.testing.assert_allclose(grp_y2, base_y2, atol=atol)


def test_spatial_group_bwd_refuses(rng, monkeypatch):
    """Training with D3DP_SPATIAL_GROUP set must fail loudly (the stage
    backward recomputes ungrouped attention, so grads would be wrong)."""
    from d3dp_tpu.ops import attention as A

    B, N, C, h = 6, 9, 64, 4
    x = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.1, jnp.float32)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wp = jnp.asarray(rng.randn(C, C) * 0.1, jnp.float32)
    bp = jnp.zeros((C,), jnp.float32)
    s1, b1 = jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)

    monkeypatch.setenv("D3DP_SPATIAL_GROUP", "3")
    fn = lambda xx: jnp.sum(A.attention_stage_p(
        xx, wqkv, bqkv, wp, bp, s1, b1, s1, b1, h, 0.125, 1e-6)[0])
    with pytest.raises(NotImplementedError, match="SPATIAL_GROUP"):
        jax.grad(fn)(x)
    monkeypatch.delenv("D3DP_SPATIAL_GROUP", raising=False)
    A._attention_stage_fwd.clear_cache()


@pytest.mark.parametrize("variant", ["bf16gelu", "nogelu"])
def test_mlp_kernel_variants(rng, variant, monkeypatch):
    """Kernel-lab MLP variants (D3DP_MLP_VARIANT). `bf16gelu` evaluates the
    erf polynomial in bf16 on the bf16 path — a rounding-only change, loose
    bf16 tolerance on the LN-normalised output. `nogelu` is a WRONG-MATH
    diagnostic bound and must actually change the result (guards against
    the env switch silently not reaching the kernel)."""
    from d3dp_tpu.ops import mlp as M

    B, D1, D2, C = 2, 5, 7, 64
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, D1, D2, C) * 0.5, dt)
    res = jnp.asarray(rng.randn(B, D1, D2, C) * 0.5, dt)
    w1 = jnp.asarray(rng.randn(C, 2 * C) * 0.1, dt)
    b1 = jnp.asarray(rng.randn(2 * C) * 0.01, dt)
    w2 = jnp.asarray(rng.randn(2 * C, C) * 0.1, dt)
    b2 = jnp.asarray(rng.randn(C) * 0.01, dt)
    ones, zeros = jnp.ones((C,), dt), jnp.zeros((C,), dt)

    def run():
        M._mlp_block_t_fwd.clear_cache()  # env is trace-time state
        out = M._mlp_block_t_fwd(x, res, w1, b1, w2, b2, ones, zeros, 1e-6)
        return np.asarray(out, np.float32)

    monkeypatch.delenv("D3DP_MLP_VARIANT", raising=False)
    base = run()
    monkeypatch.setenv("D3DP_MLP_VARIANT", variant)
    var = run()
    monkeypatch.delenv("D3DP_MLP_VARIANT", raising=False)
    M._mlp_block_t_fwd.clear_cache()

    if variant == "bf16gelu":
        np.testing.assert_allclose(var, base, atol=5e-2)
    else:
        assert np.max(np.abs(var - base)) > 1e-2


class _FakeDevice:
    def __init__(self, platform, device_kind):
        self.platform = platform
        self.device_kind = device_kind


@pytest.mark.parametrize("platform,kind,env,expect_warn", [
    ("cpu", "cpu", {}, False),
    ("tpu", "TPU v5 lite", {}, False),            # the tuned generation
    ("tpu", "TPU v4", {}, True),                  # untuned -> advisory
    ("tpu", "TPU v6 lite", {}, True),
    ("tpu", "TPU v4", {"D3DP_TB_ATTN_T": "16"}, False),  # user retuned
])
def test_tile_generation_advisory(platform, kind, env, expect_warn,
                                  monkeypatch, recwarn):
    """The baked tile defaults are v5e measurements; a first kernel launch
    on another TPU generation must say so ONCE (and stay silent when the
    user already pinned overrides)."""
    from d3dp_tpu.ops import tuning

    monkeypatch.setattr(tuning, "_checked", False)
    monkeypatch.setattr(tuning.jax, "devices",
                        lambda: [_FakeDevice(platform, kind)])
    for k in ("D3DP_TB_ATTN_T", "D3DP_MLP_TILE_SP"):
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)

    tuning.check_tile_generation()
    msgs = [str(w.message) for w in recwarn.list]
    assert any("tile defaults" in m for m in msgs) == expect_warn
    # second call never re-warns
    n = len(recwarn.list)
    tuning.check_tile_generation()
    assert len(recwarn.list) == n
