"""Pallas fused MLP-block kernel: fc1 -> exact-erf GELU -> fc2 -> residual
add -> LayerNorm, one VMEM pass per row tile.

This is the second half of a MixSTE block (models/mixste.py Block._fused).
The op is tokenwise, so tiles are plain (TR, C) row blocks — each tile does
two well-shaped MXU matmuls ((TR,C)@(C,H) and (TR,H)@(H,C)) with the hidden
activation, the GELU, the residual add and the (shared) LayerNorm all kept
in VMEM. The XLA composition round-trips the hidden (2C-wide) activation
and the residual/norm through HBM (~12 activation passes per block vs 3
here).

Differentiable via custom VJP (XLA-composed backward that recomputes the
hidden activation — the op is bandwidth-bound, not FLOP-bound).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_poly_from_abs(a, s):
    """A&S 7.1.26 erf body given |x| and sign(x) separately — Mosaic cannot
    compare bf16 vectors, so bf16 callers must derive `a`/`s` in f32 and
    cast them down before entering the polynomial."""
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _erf32(x):
    """erf to 1.5e-7 abs error (Abramowitz-Stegun 7.1.26) — Mosaic has no
    erf primitive; this is ~100x below bf16 resolution and below every fp32
    parity tolerance in the suite."""
    return _erf_poly_from_abs(jnp.abs(x), jnp.sign(x))


def _gelu_exact(x32, exact_erf=False):
    """torch nn.GELU default (erf form) — parity with the reference.

    In-kernel callers must use the _erf32 polynomial (Mosaic cannot lower
    lax.erf); its 1.5e-7 abs error is the fused path's only deviation from
    the bit-exact erf and sits well below every parity tolerance. XLA-side
    recomputes (custom-VJP backwards) pass exact_erf=True — marginally MORE
    accurate than the forward, which is fine: the strict-parity fp32+XLA
    path never enters these kernels at all."""
    erf = jax.lax.erf if exact_erf else _erf32
    return 0.5 * x32 * (1.0 + erf(x32 * (2.0**-0.5)))


def _mlp_variant():
    """Experimental MLP-kernel variants (kernel-lab; see PERFORMANCE.md):
    '' = production erf-poly GELU in fp32; 'bf16gelu' = the same A&S
    polynomial evaluated in bf16 (bf16 path only; halves the dominant VPU
    divide/exp/FMA traffic of the activation); 'nogelu' = identity in place
    of the GELU — WRONG MATH, lab-only diagnostic bounding how much of the
    block the activation costs."""
    return os.environ.get("D3DP_MLP_VARIANT", "")


def _gelu_inkernel(h32, f32_prec):
    variant = _mlp_variant()
    if variant == "nogelu":
        return h32
    if variant == "bf16gelu" and not f32_prec:
        # |z| and sign(z) in f32 (Mosaic rejects bf16 vector compares),
        # polynomial + exp in bf16 — the VPU-heavy part of the activation.
        z32 = h32 * (2.0**-0.5)
        erf = _erf_poly_from_abs(jnp.abs(z32).astype(jnp.bfloat16),
                                 jnp.sign(z32).astype(jnp.bfloat16))
        h16 = h32.astype(jnp.bfloat16)
        return (0.5 * h16 * (1.0 + erf)).astype(jnp.float32)
    return _gelu_exact(h32)


def _mlp_block_kernel(x_ref, res_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      lns_ref, lnb_ref, *args, eps, f32_prec, has_dp=False):
    if has_dp:
        dp_ref, o_ref = args
    else:
        dp_ref, (o_ref,) = None, args
    prec = jax.lax.Precision.HIGHEST if f32_prec else None
    h = jax.lax.dot_general(
        x_ref[:], w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    h = _gelu_inkernel(h + b1_ref[:].astype(jnp.float32), f32_prec)
    out = jax.lax.dot_general(
        h.astype(x_ref.dtype), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    branch = out + b2_ref[:].astype(jnp.float32)
    if has_dp:
        # per-row DropPath scale on the whole MLP branch (incl. fc2 bias);
        # dp block is (TR, 1, 1) — drop the trailing singleton to broadcast
        # against the (TR, C) rows
        branch = branch * dp_ref[:].astype(jnp.float32).reshape(-1, 1)
    s = res_ref[:].astype(jnp.float32) + branch

    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    y = (s - mu) * jax.lax.rsqrt(var + eps)
    y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("eps", "interpret", "tr"))
def _mlp_block_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps,
                   interpret=None, tr=None, dp=None):
    R, C = x.shape
    H = w1.shape[1]
    if interpret is None:
        from d3dp_tpu.ops.attention import _interpret_default

        interpret = _interpret_default()
    if tr is None:
        v = os.environ.get("D3DP_MLP_TILE_ROWS", "")
        tr = min(R, int(v) if v else 512)
    mem = pl.ANY if interpret else pltpu.VMEM
    row_spec = pl.BlockSpec((tr, C), lambda i: (i, 0), memory_space=mem)
    w1_spec = pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=mem)
    w2_spec = pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=mem)
    vc_spec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=mem)
    vh_spec = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=mem)
    in_specs = [row_spec, row_spec, w1_spec, vh_spec, w2_spec, vc_spec,
                vc_spec, vc_spec]
    inputs = [x, res, w1, b1.reshape(1, H), w2, b2.reshape(1, C),
              ln_scale.reshape(1, C), ln_bias.reshape(1, C)]
    if dp is not None:
        # trailing singletons keep Mosaic's last-two-dims block constraint
        # trivially satisfied for any row tile tr
        in_specs.append(pl.BlockSpec((tr, 1, 1), lambda i: (i, 0, 0),
                                     memory_space=mem))
        inputs.append(dp.astype(jnp.float32).reshape(R, 1, 1))
    return pl.pallas_call(
        partial(_mlp_block_kernel, eps=eps,
                f32_prec=(x.dtype == jnp.float32), has_dp=dp is not None),
        out_shape=jax.ShapeDtypeStruct((R, C), x.dtype),
        grid=(pl.cdiv(R, tr),),
        in_specs=in_specs,
        out_specs=row_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * R * C * H,
            bytes_accessed=3 * R * C * x.dtype.itemsize,
            transcendentals=R * H,
        ),
    )(*inputs)


def _mlp_block_t_kernel(x_ref, res_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        lns_ref, lnb_ref, *args, eps, f32_prec,
                        has_dp=False):
    """Transposing variant: identical math on a (1, D1, D2, C) tile, but the
    output tile is (1, D2, D1, C) — the swap happens in VMEM so the layout
    change rides the kernel's output DMA instead of a standalone XLA
    transpose over the full activation set.

    has_dp: per-row DropPath scale, (1, D1-block, 1) tile aligned with the
    tile's leading (row-derived) axis — constant across the D2 token axis."""
    if has_dp:
        dp_ref, o_ref = args
    else:
        dp_ref, (o_ref,) = None, args
    prec = jax.lax.Precision.HIGHEST if f32_prec else None
    x = x_ref[0]
    # collapse the (tile, D) leading dims so the matmuls see one (tile*D, C)
    # M dimension instead of a rank-3 contraction — measured 9% faster
    # end-to-end on v5e than the rank-3 form (PERFORMANCE.md r2 tile sweep)
    D1_, D2_, C_ = x.shape
    x2d = x.reshape(D1_ * D2_, C_)
    h = jax.lax.dot_general(
        x2d, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    h = _gelu_inkernel(h + b1_ref[:].astype(jnp.float32), f32_prec)
    out = jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    out = out.reshape(D1_, D2_, C_)
    branch = out + b2_ref[:].astype(jnp.float32)
    if has_dp:
        # dp block (1, D1_, 1, 1) -> (D1_, 1, 1) broadcast over the tile
        branch = branch * dp_ref[0].astype(jnp.float32)
    s = res_ref[0].astype(jnp.float32) + branch

    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    y = (s - mu) * jax.lax.rsqrt(var + eps)
    y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    o_ref[0] = jnp.swapaxes(y, 0, 1).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("eps", "interpret", "tile"))
def _mlp_block_t_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps,
                     interpret=None, tile=None, dp=None):
    """x/res: (B, D1, D2, C) -> out (B, D2, D1, C). Tiles the larger of
    D1/D2 (the frame axis); the 17-joint axis always rides whole.
    dp: optional (B, D1) per-row DropPath scales (rows of the pre-reshape
    (B*D1, D2, C) stage input)."""
    B, D1, D2, C = x.shape
    H = w1.shape[1]
    if interpret is None:
        from d3dp_tpu.ops.attention import _interpret_default

        interpret = _interpret_default()
    tile_first = D1 >= D2
    if tile is None:
        import os
        v = os.environ.get(
            "D3DP_MLP_TILE_SP" if tile_first else "D3DP_MLP_TILE_TP", "")
        tile = int(v) if v else None
    if tile is None:
        # 128 frames/tile (~2k-token tiles) measured best in-graph on v5e
        # with the flattened-M matmuls (r2 sweep: 24-tile 133.4 ms/fwd ->
        # 128-tile 129.5 ms at the flagship eval shape)
        tile = min(128, D1 if tile_first else D2)
    mem = pl.ANY if interpret else pltpu.VMEM

    if tile_first:
        grid = (B, pl.cdiv(D1, tile))
        in_spec = pl.BlockSpec((1, tile, D2, C), lambda b, t: (b, t, 0, 0),
                               memory_space=mem)
        out_spec = pl.BlockSpec((1, D2, tile, C), lambda b, t: (b, 0, t, 0),
                                memory_space=mem)
    else:
        grid = (B, pl.cdiv(D2, tile))
        in_spec = pl.BlockSpec((1, D1, tile, C), lambda b, t: (b, 0, t, 0),
                               memory_space=mem)
        out_spec = pl.BlockSpec((1, tile, D1, C), lambda b, t: (b, t, 0, 0),
                                memory_space=mem)
    w1_spec = pl.BlockSpec((C, H), lambda b, t: (0, 0), memory_space=mem)
    w2_spec = pl.BlockSpec((H, C), lambda b, t: (0, 0), memory_space=mem)
    vc_spec = pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=mem)
    vh_spec = pl.BlockSpec((1, H), lambda b, t: (0, 0), memory_space=mem)
    in_specs = [in_spec, in_spec, w1_spec, vh_spec, w2_spec, vc_spec,
                vc_spec, vc_spec]
    inputs = [x, res, w1, b1.reshape(1, H), w2, b2.reshape(1, C),
              ln_scale.reshape(1, C), ln_bias.reshape(1, C)]
    if dp is not None:
        # (B, D1, 1, 1): the trailing singletons satisfy Mosaic's last-two-
        # dims block constraint for any D1 tile
        if tile_first:
            dp_spec = pl.BlockSpec((1, tile, 1, 1),
                                   lambda b, t: (b, t, 0, 0),
                                   memory_space=mem)
        else:
            dp_spec = pl.BlockSpec((1, D1, 1, 1), lambda b, t: (b, 0, 0, 0),
                                   memory_space=mem)
        in_specs.append(dp_spec)
        inputs.append(dp.astype(jnp.float32).reshape(B, D1, 1, 1))
    return pl.pallas_call(
        partial(_mlp_block_t_kernel, eps=eps,
                f32_prec=(x.dtype == jnp.float32), has_dp=dp is not None),
        out_shape=jax.ShapeDtypeStruct((B, D2, D1, C), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * D1 * D2 * C * H,
            bytes_accessed=3 * B * D1 * D2 * C * x.dtype.itemsize,
            transcendentals=B * D1 * D2 * H,
        ),
    )(*inputs)


@partial(jax.custom_vjp, nondiff_argnums=(8,))
def mlp_block_t_p(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps):
    """Transposing fused MLP block: y = LN(res + fc2(gelu(fc1(x)))) with the
    output relayouted (B, D1, D2, C) -> (B, D2, D1, C) inside the kernel —
    the spatial<->temporal transpose of MixSTE costs no standalone pass."""
    return _mlp_block_t_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps)


def _mlp_block_t_p_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps):
    out = _mlp_block_t_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps)
    return out, (x, res, w1, b1, w2, b2, ln_scale)


def _mlp_block_t_p_bwd(eps, resids, gy):
    x, res, w1, b1, w2, b2, ln_scale = resids
    B, D1, D2, C = x.shape
    gy_flat = jnp.swapaxes(gy, 1, 2).reshape(B * D1 * D2, C)
    grads = _mlp_block_p_bwd(
        eps, (x.reshape(B * D1 * D2, C), res.reshape(B * D1 * D2, C),
              w1, b1, w2, b2, ln_scale), gy_flat)
    dx, dres = grads[0].reshape(x.shape), grads[1].reshape(res.shape)
    return (dx, dres) + grads[2:]


@partial(jax.custom_vjp, nondiff_argnums=(8,))
def mlp_block_p(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps):
    """y = LN(res + fc2(gelu(fc1(x)))). x/res: (R, C); returns (R, C)."""
    return _mlp_block_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps)


def _mlp_block_p_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps):
    out = _mlp_block_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps)
    return out, (x, res, w1, b1, w2, b2, ln_scale)


def _mlp_block_p_bwd(eps, resids, gy):
    return _mlp_bwd_impl(eps, resids, gy, dp=None)


def _mlp_bwd_impl(eps, resids, gy, dp=None):
    """Shared MLP-block backward. With dp (per-row DropPath scale s, (R,1)):
    s32 = res + s*(fc2(gelu(fc1(x))) + b2) — the branch-side cotangent is
    s*ds while the residual passthrough stays unscaled.

    Matmuls run in the forward's compute dtype (`md`) with fp32
    accumulation — fp32 passes keep HIGHEST precision (grad-parity tests);
    bf16 passes keep the MXU at full rate (upcasting the backward einsums
    to fp32 quartered their throughput on v5e — r4 train lab). The GELU
    recompute/derivative stays fp32 elementwise (VPU, precision-critical)."""
    from d3dp_tpu.ops.norm import _ln_bwd_rows

    x, res, w1, b1, w2, b2, ln_scale = resids
    md = x.dtype
    prec = jax.lax.Precision.HIGHEST if md == jnp.float32 else None
    f32 = jnp.float32
    # recomputed activations must use the same (HIGHEST for fp32) matmul
    # precision as the forward kernel — this build defaults fp32 matmuls low
    pre = jnp.matmul(x, w1.astype(md), precision=prec,
                     preferred_element_type=f32) + b1.astype(f32)
    h = _gelu_exact(pre, exact_erf=True)
    hb = h.astype(md)
    branch32 = (jnp.matmul(hb, w2.astype(md), precision=prec,
                           preferred_element_type=f32)
                + b2.astype(f32))
    if dp is not None:
        dp32 = dp.astype(f32).reshape(-1, 1)
        branch32 = branch32 * dp32
    s32 = res.astype(f32) + branch32

    ds, dln_scale, dln_bias = _ln_bwd_rows(s32, ln_scale, gy, eps)
    dres = ds.astype(res.dtype)
    ds_b = ds if dp is None else ds * dp32
    ds_m = ds_b.astype(md)
    dw2 = jnp.einsum("rh,rc->hc", hb, ds_m, precision=prec,
                     preferred_element_type=f32).astype(w2.dtype)
    db2 = jnp.sum(ds_b, axis=0).astype(b2.dtype)
    dh = jnp.einsum("rc,hc->rh", ds_m, w2.astype(md), precision=prec,
                    preferred_element_type=f32)
    # d gelu(p) = 0.5*(1+erf(p/sqrt2)) + p * pdf(p)
    dpre = dh * (0.5 * (1.0 + jax.lax.erf(pre * (2.0**-0.5)))
                 + pre * jnp.exp(-0.5 * pre * pre) * (2.0 * jnp.pi) ** -0.5)
    dpre_m = dpre.astype(md)
    dw1 = jnp.einsum("rc,rh->ch", x, dpre_m, precision=prec,
                     preferred_element_type=f32).astype(w1.dtype)
    db1 = jnp.sum(dpre, axis=0).astype(b1.dtype)
    dx = jnp.einsum("rh,ch->rc", dpre_m, w1.astype(md), precision=prec,
                    preferred_element_type=f32).astype(x.dtype)
    return (dx, dres, dw1, db1, dw2, db2, dln_scale.astype(ln_scale.dtype),
            dln_bias.astype(ln_scale.dtype))


mlp_block_p.defvjp(_mlp_block_p_fwd, _mlp_block_p_bwd)
mlp_block_t_p.defvjp(_mlp_block_t_p_fwd, _mlp_block_t_p_bwd)


# ---------------------------------------------------------------- DropPath
# Training-path variants: y = LN(res + dp*(fc2(gelu(fc1(x))) + b2)) with a
# per-row stochastic-depth scale dp (bernoulli(keep)/keep draws). These keep
# the TRAIN forward on the fused kernels — the reference trains with
# drop_path_rate=0.1 (diffusionpose.py:121-123). dp is non-differentiable.


@partial(jax.custom_vjp, nondiff_argnums=(9,))
def mlp_block_dp_p(x, res, w1, b1, w2, b2, ln_scale, ln_bias, dp, eps):
    """mlp_block_p with a per-row DropPath scale dp: (R,) or (R, 1)."""
    return _mlp_block_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps,
                          dp=dp)


def _mlp_block_dp_p_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, dp, eps):
    out = _mlp_block_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps,
                         dp=dp)
    return out, (x, res, w1, b1, w2, b2, ln_scale, dp)


def _mlp_block_dp_p_bwd(eps, resids, gy):
    dp = resids[-1]
    grads = _mlp_bwd_impl(eps, resids[:-1], gy, dp=dp)
    return grads + (jnp.zeros_like(dp),)


@partial(jax.custom_vjp, nondiff_argnums=(9,))
def mlp_block_t_dp_p(x, res, w1, b1, w2, b2, ln_scale, ln_bias, dp, eps):
    """mlp_block_t_p with per-row DropPath scales dp: (B, D1) — one scale
    per row of the stage's pre-reshape (B*D1, D2, C) input."""
    return _mlp_block_t_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps,
                            dp=dp)


def _mlp_block_t_dp_p_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, dp,
                          eps):
    out = _mlp_block_t_fwd(x, res, w1, b1, w2, b2, ln_scale, ln_bias, eps,
                           dp=dp)
    return out, (x, res, w1, b1, w2, b2, ln_scale, dp)


def _mlp_block_t_dp_p_bwd(eps, resids, gy):
    x, res, w1, b1, w2, b2, ln_scale, dp = resids
    B, D1, D2, C = x.shape
    gy_flat = jnp.swapaxes(gy, 1, 2).reshape(B * D1 * D2, C)
    dp_flat = jnp.broadcast_to(
        dp.astype(jnp.float32).reshape(B, D1, 1), (B, D1, D2)
    ).reshape(B * D1 * D2, 1)
    grads = _mlp_bwd_impl(
        eps, (x.reshape(B * D1 * D2, C), res.reshape(B * D1 * D2, C),
              w1, b1, w2, b2, ln_scale), gy_flat, dp=dp_flat)
    dx, dres = grads[0].reshape(x.shape), grads[1].reshape(res.shape)
    return (dx, dres) + grads[2:] + (jnp.zeros_like(dp),)


mlp_block_dp_p.defvjp(_mlp_block_dp_p_fwd, _mlp_block_dp_p_bwd)
mlp_block_t_dp_p.defvjp(_mlp_block_t_dp_p_fwd, _mlp_block_t_dp_p_bwd)
