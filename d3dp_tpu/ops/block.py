"""Fully-fused MixSTE transformer block as one Pallas kernel.

STATUS: EXPERIMENTAL — not wired into the product model. At VMEM-feasible
batch tiles Mosaic's matmul throughput loses more than the fusion saves
(measured 13.6ms vs ~11.5ms decomposed for the temporal shape; see
PERFORMANCE.md "what we tried that did NOT win"). Kept as the starting
point for a future cross-block-residency design.

One grid cell executes, entirely in VMEM for a (TB, N, C) activation tile:

    h   = LayerNorm1(x)
    a   = Attention(h @ Wqkv + bqkv) @ Wproj + bproj
    x2  = x + a
    m   = MLP(LayerNorm2(x2))            # fc1 -> exact GELU -> fc2
    x3  = x2 + m
    out = SharedNorm(x3)                 # the per-depth shared spatial/
                                         # temporal norm (mixste.py:203-204)

Motivation (profiled on v5e): with XLA orchestrating these ops the forward
spends ~32% in LayerNorm convert+reduce fusions, ~24% in elementwise
fusions and ~8% in pure copies — every step round-trips a 169MB activation
through HBM. Fused, each block reads x once and writes out once; weights
(~4MB bf16) stream per grid cell.

All tensors stay rank-3 inside the kernel (Mosaic rejects rank-changing
reshapes); matmuls are rank-3 x rank-2 contractions; softmax and LayerNorm
statistics run in fp32.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3dp_tpu.ops.attention import _tile_rows


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf, max abs err 1.5e-7 (fp32) — Mosaic has
    no erf primitive; this keeps GELU exact-to-bf16 inside the kernel."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """0.5 * x * (1 + erf(x / sqrt(2))) in fp32."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _layernorm(x, scale, bias, eps):
    """LN over the last axis; stats in fp32. x: (TB,N,C) any float dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype)


def _prec(dtype):
    """Full fp32 MXU passes for f32 inputs (Mosaic defaults low)."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _matmul3(x, w, b):
    """(TB,N,Ci) @ (Ci,Co) + (Co,) -> (TB,N,Co), fp32 accumulate."""
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(x.dtype),
    )
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _block_kernel(x_ref,
                  ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b,
                  ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b,
                  lns_s, lns_b,
                  o_ref, *, scale, num_heads, head_dim, eps):
    C = num_heads * head_dim
    x = x_ref[...]

    h = _layernorm(x, ln1_s[0], ln1_b[0], eps)
    qkv = _matmul3(h, qkv_w[...], qkv_b[0])

    # per-head attention from lane slices of the fused qkv
    attn = []
    for hi in range(num_heads):
        q = qkv[:, :, hi * head_dim : (hi + 1) * head_dim]
        k = qkv[:, :, C + hi * head_dim : C + (hi + 1) * head_dim]
        v = qkv[:, :, 2 * C + hi * head_dim : 2 * C + (hi + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_prec(q.dtype))
        s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        a = (p / l).astype(v.dtype)
        attn.append(
            jax.lax.dot_general(
                a, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=_prec(q.dtype)).astype(x.dtype))
    attn_out = jnp.concatenate(attn, axis=-1)

    x2 = x + _matmul3(attn_out, proj_w[...], proj_b[0])

    h2 = _layernorm(x2, ln2_s[0], ln2_b[0], eps)
    m1 = _matmul3(h2, fc1_w[...], fc1_b[0])
    m1 = _gelu_exact(m1.astype(jnp.float32)).astype(x2.dtype)
    x3 = x2 + _matmul3(m1, fc2_w[...], fc2_b[0])

    o_ref[...] = _layernorm(x3, lns_s[0], lns_b[0], eps)


@partial(jax.jit,
         static_argnames=("num_heads", "scale", "eps", "interpret", "tb"))
def fused_block(x, weights, num_heads, scale, eps=1e-6, interpret=None,
                tb=None):
    """Run one fused transformer block (+shared post-norm).

    x: (B, N, C); weights: dict with ln1/ln2/lns scale+bias (C,), qkv (C,3C)
    + bias, proj (C,C) + bias, fc1 (C,Ch) + bias, fc2 (Ch,C) + bias —
    pre-cast to the compute dtype. Returns (B, N, C).
    """
    B, N, C = x.shape
    d = C // num_heads
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if tb is None:
        tb = _tile_rows(B, N)

    mem = pltpu.ANY if interpret else pltpu.VMEM
    tile = pl.BlockSpec((tb, N, C), lambda i: (i, 0, 0), memory_space=mem)

    # broadcast weight specs: whole array every grid cell. 1-D params are
    # passed as (1, C) rows so they have a lane axis.
    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=mem)

    w = weights
    row = lambda a: a.reshape(1, -1)
    args = [
        row(w["ln1_scale"]), row(w["ln1_bias"]),
        w["qkv_kernel"], row(w["qkv_bias"]),
        w["proj_kernel"], row(w["proj_bias"]),
        row(w["ln2_scale"]), row(w["ln2_bias"]),
        w["fc1_kernel"], row(w["fc1_bias"]),
        w["fc2_kernel"], row(w["fc2_bias"]),
        row(w["lns_scale"]), row(w["lns_bias"]),
    ]
    in_specs = [tile] + [wspec(a.shape) for a in args]

    return pl.pallas_call(
        partial(_block_kernel, scale=scale, num_heads=num_heads, head_dim=d,
                eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B // tb,),
        in_specs=in_specs,
        out_specs=tile,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (8 * C * C + 2 * N * C),
            bytes_accessed=2 * B * N * C * x.dtype.itemsize,
            transcendentals=B * N * (num_heads * N + 2 * C),
        ),
    )(x, *args)
