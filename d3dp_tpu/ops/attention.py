"""Pallas fused attention for MixSTE's two shapes (17 spatial / 243 temporal
tokens).

Why a custom kernel: both attention shapes have tiny token counts, so the
XLA path materialises (B, h, N, N) logit tensors whose 17- or 243-wide
trailing dims pad catastrophically against the TPU's (8,128) tiles — measured
~60% of total model time spent in attention that is nearly FLOP-free. This
kernel keeps Q·K^T, the fp32 softmax, and A·V entirely in VMEM per batch
tile; logits never touch HBM and no head transpose ever happens (the packed
(B, N, h*d) qkv layout is consumed directly, heads unrolled as lane slices).

Whole sequences fit in VMEM (N <= 243), so no online-softmax streaming is
needed — the degenerate flash-attention case: one tile covers the full row.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads, head_dim):
    # blocks are (TB, N, h*d); heads unrolled as static lane slices
    for hi in range(num_heads):
        sl = slice(hi * head_dim, (hi + 1) * head_dim)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        _attn_head(q, k, v, o_ref, sl, scale)


def _attn_head(q, k, v, o_ref, sl, scale):
    # full fp32 MXU passes for f32 inputs (Mosaic defaults low like XLA);
    # bf16 inputs are unaffected
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    # batched (TB, N, D) x (TB, N, D)^T -> (TB, N, N), fp32 accumulate
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    s = s * scale
    # fp32 softmax, stable (matches the reference's fp32 torch softmax)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    a = (p / l).astype(v.dtype)

    o = jax.lax.dot_general(
        a, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _attn_fused_qkv_kernel(qkv_ref, o_ref, *, scale, num_heads, head_dim):
    """Variant consuming the fused (TB, N, 3*h*d) qkv projection directly —
    no q/k/v slice copies ever materialise in HBM."""
    C = num_heads * head_dim
    for hi in range(num_heads):
        sl = slice(hi * head_dim, (hi + 1) * head_dim)
        q = qkv_ref[:, :, hi * head_dim : (hi + 1) * head_dim]
        k = qkv_ref[:, :, C + hi * head_dim : C + (hi + 1) * head_dim]
        v = qkv_ref[:, :, 2 * C + hi * head_dim : 2 * C + (hi + 1) * head_dim]
        _attn_head(q, k, v, o_ref, sl, scale)


def _tile_rows(B, N):
    """Batch-tile size: largest divisor of B under an empirically-tuned
    target (measured on v5e: ~128 rows for the 17-token shape, ~8 rows for
    the 243-token shape — beyond that VMEM pressure erodes pipelining)."""
    if N <= 32:
        target = 128
    elif N <= 256:
        target = 8
    else:
        target = 1
    tb = 1
    for d in range(1, min(B, target) + 1):
        if B % d == 0:
            tb = d
    return tb


@partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def fused_attention_packed(q, k, v, num_heads, scale, interpret=None):
    """q, k, v: (B, N, h*d) packed heads -> (B, N, h*d).

    Grid: (B/TB,); each cell computes full attention for TB sequences with
    everything resident in VMEM.
    """
    B, N, C = q.shape
    d = C // num_heads
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    tb = _tile_rows(B, N)

    spec = pl.BlockSpec(
        (tb, N, C),
        lambda i: (i, 0, 0),
        memory_space=pltpu.ANY if interpret else pltpu.VMEM,
    )
    return pl.pallas_call(
        partial(_attn_kernel, scale=scale, num_heads=num_heads, head_dim=d),
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        grid=(B // tb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * N * N * C,
            bytes_accessed=4 * B * N * C * q.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
    )(q, k, v)


def _attn_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, scale, num_heads,
                     head_dim, f32_prec):
    """Backward of fused attention: recompute the softmax (flash-style, no
    saved probabilities) and emit d(qkv) in the packed layout."""
    C = num_heads * head_dim
    prec = jax.lax.Precision.HIGHEST if f32_prec else None
    for hi in range(num_heads):
        q = qkv_ref[:, :, hi * head_dim : (hi + 1) * head_dim]
        k = qkv_ref[:, :, C + hi * head_dim : C + (hi + 1) * head_dim]
        v = qkv_ref[:, :, 2 * C + hi * head_dim : 2 * C + (hi + 1) * head_dim]
        do = do_ref[:, :, hi * head_dim : (hi + 1) * head_dim]

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (TB,N,N) fp32

        pb = p.astype(v.dtype)
        # dV = P^T dO
        dv = jax.lax.dot_general(
            pb, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        # dP = dO V^T
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        # dS = P o (dP - rowsum(dP o P)), then scale
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)
        # dQ = dS K ; dK = dS^T Q
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)

        dqkv_ref[:, :, hi * head_dim : (hi + 1) * head_dim] = dq.astype(
            dqkv_ref.dtype)
        dqkv_ref[:, :, C + hi * head_dim : C + (hi + 1) * head_dim] = dk.astype(
            dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * C + hi * head_dim : 2 * C + (hi + 1) * head_dim] = (
            dv.astype(dqkv_ref.dtype))


@partial(jax.jit, static_argnames=("num_heads", "scale", "interpret", "tb"))
def _fused_attention_qkv_bwd(qkv, dout, num_heads, scale, interpret=None,
                             tb=None):
    B, N, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if tb is None:
        tb = max(_tile_rows(B, N) // 2, 1)  # backward holds more live fp32
        while B % tb:
            tb -= 1

    mem = pltpu.ANY if interpret else pltpu.VMEM
    in_spec = pl.BlockSpec((tb, N, C3), lambda i: (i, 0, 0), memory_space=mem)
    do_spec = pl.BlockSpec((tb, N, C), lambda i: (i, 0, 0), memory_space=mem)
    return pl.pallas_call(
        partial(_attn_bwd_kernel, scale=scale, num_heads=num_heads,
                head_dim=d, f32_prec=(qkv.dtype == jnp.float32)),
        out_shape=jax.ShapeDtypeStruct((B, N, C3), qkv.dtype),
        grid=(B // tb,),
        in_specs=[in_spec, do_spec],
        out_specs=in_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv, dout)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention_qkv_ad(qkv, num_heads, scale):
    """Differentiable fused attention (custom VJP; softmax recomputed in the
    backward kernel, flash-style) — lets TRAINING use the Pallas path."""
    return fused_attention_qkv(qkv, num_heads, scale)


def _ad_fwd(qkv, num_heads, scale):
    return fused_attention_qkv(qkv, num_heads, scale), qkv


def _ad_bwd(num_heads, scale, qkv, dout):
    return (_fused_attention_qkv_bwd(qkv, dout, num_heads, scale),)


fused_attention_qkv_ad.defvjp(_ad_fwd, _ad_bwd)


def fused_attention(q, k, v, scale, interpret=None):
    """(B, N, h, d) convenience wrapper (free reshapes to packed layout)."""
    B, N, h, d = q.shape
    out = fused_attention_packed(
        q.reshape(B, N, h * d), k.reshape(B, N, h * d), v.reshape(B, N, h * d),
        h, scale, interpret=interpret)
    return out.reshape(B, N, h, d)


@partial(jax.jit, static_argnames=("num_heads", "scale", "interpret", "tb"))
def fused_attention_qkv(qkv, num_heads, scale, interpret=None, tb=None):
    """Attention straight from the fused qkv projection.

    qkv: (B, N, 3*h*d) — the raw output of the qkv Dense layer, consumed
    in place (no q/k/v slice copies). Returns (B, N, h*d).
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if tb is None:
        tb = _tile_rows(B, N)

    in_spec = pl.BlockSpec(
        (tb, N, C3), lambda i: (i, 0, 0),
        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (tb, N, C), lambda i: (i, 0, 0),
        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        partial(_attn_fused_qkv_kernel, scale=scale, num_heads=num_heads,
                head_dim=d),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B // tb,),
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * N * N * C,
            bytes_accessed=2 * B * N * C3 * qkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
    )(qkv)
