"""Shared analytic LayerNorm backward for the fused stage-kernel VJPs.

Historical note: this module once held standalone Pallas LayerNorm and
residual-add+LN kernels. They beat XLA's lone LN by ~25% in isolation but
LOST ~45% in the full graph — XLA fuses LNs and adds into neighbouring
matmul epilogues, and opaque kernel boundaries broke that (see
PERFORMANCE.md "What LOST"). They were removed; LayerNorm only pays for
itself inside the bigger fused stage kernels (ops/attention.py
attention_stage_p, ops/mlp.py mlp_block_p), whose backwards share these
helpers.
"""

import jax
import jax.numpy as jnp


def _ln_stats(s32, eps):
    mu = jnp.mean(s32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s32 - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (s32 - mu) * rstd, rstd


def _ln_bwd_rows(s32, scale, g, eps):
    """Analytic LayerNorm backward. Returns (ds fp32, dscale, dbias)."""
    shat, rstd = _ln_stats(s32, eps)
    g32 = g.astype(jnp.float32)
    gs = g32 * scale.astype(jnp.float32)
    ds = rstd * (
        gs
        - jnp.mean(gs, axis=-1, keepdims=True)
        - shat * jnp.mean(gs * shat, axis=-1, keepdims=True)
    )
    dscale = jnp.sum(g32 * shat, axis=0)
    dbias = jnp.sum(g32, axis=0)
    return ds, dscale, dbias
