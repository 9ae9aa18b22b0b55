"""Depth-resident megakernel (ops/resident.py, fuse_level=5) exactness.

The resident path must agree with the qualified level-4 fused pipeline (its
math is the same helpers in the same order), share its parameter tree
(checkpoint compatibility), and stay exact when the chunk loops overlap
(clamped starts recompute identical rows)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3dp_tpu.models import MixSTE2, MixSTEConfig


def _cfg(dtype, fuse_level, F=9, J=5, C=32, depth=3):
    return MixSTEConfig(
        num_frames=F, num_joints=J, embed_dim=C, depth=depth, num_heads=4,
        mlp_ratio=2.0, dtype=dtype, attention_impl="pallas",
        fuse_level=fuse_level)


def _inputs(F=9, J=5, B=3, seed=0):
    rng = np.random.RandomState(seed)
    x2d = jnp.asarray(rng.randn(B, F, J, 2) * 0.3, jnp.float32)
    x3d = jnp.asarray(rng.randn(B, F, J, 3) * 0.3, jnp.float32)
    t = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)
    return x2d, x3d, t


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5),
                                        (jnp.bfloat16, 5e-3)])
def test_resident_matches_level4(dtype, atol):
    cfg5 = _cfg(dtype, 5)
    cfg4 = _cfg(dtype, 4)
    x2d, x3d, t = _inputs()
    params = MixSTE2(cfg5).init(jax.random.PRNGKey(0), x2d, x3d, t)
    out5 = MixSTE2(cfg5).apply(params, x2d, x3d, t, deterministic=True)
    out4 = MixSTE2(cfg4).apply(params, x2d, x3d, t, deterministic=True)
    np.testing.assert_allclose(np.asarray(out5), np.asarray(out4),
                               atol=atol, rtol=0)


def test_param_tree_matches_level4():
    cfg5, cfg4 = _cfg(jnp.float32, 5), _cfg(jnp.float32, 4)
    x2d, x3d, t = _inputs()
    p5 = MixSTE2(cfg5).init(jax.random.PRNGKey(0), x2d, x3d, t)
    p4 = MixSTE2(cfg4).init(jax.random.PRNGKey(0), x2d, x3d, t)
    f5 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p5)
    f4 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p4)
    assert f5 == f4
    # identical init draws too (same tree paths -> same RNG folds)
    chex_ok = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(jnp.allclose(a, b)), p5, p4))
    assert chex_ok


def test_resident_overlapping_chunks_exact(monkeypatch):
    """Force multi-chunk geometry with clamped (overlapping) starts on both
    phases and pin agreement with the level-4 path."""
    monkeypatch.setenv("D3DP_RES_SP_TOKENS", "15")  # F=7,J=5 -> 3 chunks
    monkeypatch.setenv("D3DP_RES_TP_SEQS", "2")     # J=5 -> 3 chunks
    cfg5 = _cfg(jnp.float32, 5, F=7)
    cfg4 = _cfg(jnp.float32, 4, F=7)
    x2d, x3d, t = _inputs(F=7)
    params = MixSTE2(cfg5).init(jax.random.PRNGKey(1), x2d, x3d, t)
    out5 = MixSTE2(cfg5).apply(params, x2d, x3d, t, deterministic=True)
    out4 = MixSTE2(cfg4).apply(params, x2d, x3d, t, deterministic=True)
    np.testing.assert_allclose(np.asarray(out5), np.asarray(out4),
                               atol=2e-5, rtol=0)


def test_resident_training_falls_back():
    """deterministic=False must route through the differentiable per-block
    path (the resident kernel has no VJP) — gradient computation works."""
    cfg5 = _cfg(jnp.float32, 5)
    x2d, x3d, t = _inputs()
    m = MixSTE2(cfg5)
    params = m.init(jax.random.PRNGKey(0), x2d, x3d, t)

    def loss(p):
        out = m.apply(p, x2d, x3d, t, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
