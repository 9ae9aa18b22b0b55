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

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _env_tile(name):
    """Trace-time tile override for in-graph tuning experiments (e.g.
    D3DP_TB_ATTN_T=16 python bench.py). Static per process."""
    v = os.environ.get(name, "")
    return int(v) if v else None


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
        interpret = _interpret_default()
    tb = _tile_rows(B, N)

    spec = pl.BlockSpec(
        (tb, N, C),
        lambda i: (i, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
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
        interpret = _interpret_default()
    if tb is None:
        tb = max(_tile_rows(B, N) // 2, 1)  # backward holds more live fp32
        while B % tb:
            tb -= 1

    mem = pl.ANY if interpret else pltpu.VMEM
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


def _attn_block_kernel(qkv_ref, res_ref, w_ref, b_ref, lns_ref,
                       lnb_ref, x2_ref, y2_ref, acc_ref, *, scale, num_heads,
                       head_dim, eps, f32_prec):
    """attention -> out-projection -> residual add -> LayerNorm, one VMEM
    pass. Emits x2 = res + (attn@W + b) AND y2 = LN(x2) — the two tensors
    every pre-LN block consumes next."""
    C = num_heads * head_dim
    prec = jax.lax.Precision.HIGHEST if f32_prec else None
    for hi in range(num_heads):
        q = qkv_ref[:, :, hi * head_dim : (hi + 1) * head_dim]
        k = qkv_ref[:, :, C + hi * head_dim : C + (hi + 1) * head_dim]
        v = qkv_ref[:, :, 2 * C + hi * head_dim : 2 * C + (hi + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        a = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        o = jax.lax.dot_general(
            a, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        acc_ref[:, :, hi * head_dim : (hi + 1) * head_dim] = o.astype(
            acc_ref.dtype)

    # out-projection on the whole (TB, N, C) tile: one well-shaped MXU pass
    proj = jax.lax.dot_general(
        acc_ref[:], w_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    proj = proj + b_ref[:].astype(jnp.float32)
    x2 = res_ref[:].astype(jnp.float32) + proj
    x2_ref[:] = x2.astype(x2_ref.dtype)

    mu = jnp.mean(x2, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x2 - mu), axis=-1, keepdims=True)
    y2 = (x2 - mu) * jax.lax.rsqrt(var + eps)
    y2 = y2 * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    y2_ref[:] = y2.astype(y2_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "scale", "eps", "interpret",
                                   "tb"))
def _attention_block_fwd(qkv, res, w, b, ln_scale, ln_bias, num_heads,
                         scale, eps, interpret=None, tb=None):
    B, N, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    if interpret is None:
        interpret = _interpret_default()
    if tb is None:
        # temporal shapes (N >= 128) run the plain-attention tile; spatial
        # tiles halve (the fused kernel holds a fp32 scratch + proj weights
        # on top of the attention working set)
        tb = _tile_rows(B, N) if N >= 128 else max(_tile_rows(B, N) // 2, 1)
        while B % tb:
            tb -= 1

    mem = pl.ANY if interpret else pltpu.VMEM
    qkv_spec = pl.BlockSpec((tb, N, C3), lambda i: (i, 0, 0), memory_space=mem)
    row_spec = pl.BlockSpec((tb, N, C), lambda i: (i, 0, 0), memory_space=mem)
    w_spec = pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=mem)
    vec_spec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=mem)

    x2, y2 = pl.pallas_call(
        partial(_attn_block_kernel, scale=scale, num_heads=num_heads,
                head_dim=d, eps=eps,
                f32_prec=(qkv.dtype == jnp.float32)),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        ),
        grid=(B // tb,),
        in_specs=[qkv_spec, row_spec, w_spec, vec_spec, vec_spec,
                  vec_spec],
        out_specs=(row_spec, row_spec),
        scratch_shapes=[pltpu.VMEM((tb, N, C), qkv.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * N * N * C + 2 * B * N * C * C,
            bytes_accessed=6 * B * N * C * qkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
    )(qkv, res, w, b.reshape(1, C), ln_scale.reshape(1, C),
      ln_bias.reshape(1, C))
    return x2, y2


def _interpret_default():
    from d3dp_tpu.ops.tuning import check_tile_generation

    check_tile_generation()
    return jax.devices()[0].platform != "tpu"


_batched_announced = False


def _announce_batched_default():
    """One INFO line the first time the promoted temporal default engages
    on a real chip (the ADVICE-r2 rule: silent numeric-path switches get
    an announcement; fp32 is bit-exact, bf16 reorders MXU rounding only)."""
    global _batched_announced
    if not _batched_announced:
        _batched_announced = True
        print("INFO: temporal attention stage uses the batched head-major "
              "kernel (r3 default, -3.7%/fwd; set D3DP_ATTN_VARIANT_T=loop "
              "for the per-head loop)")


def _stage_variant(n_tokens=None):
    """Experimental attention-stage variants (kernel-lab; see
    PERFORMANCE.md): '' = production per-head loop; 'bf16exp' = softmax
    exp/sum in bf16 (bf16 path only; halves the VPU softmax traffic);
    'batched' = head-major (h*TB, N, d) scratch built by lane-slice copies
    + ONE batched dot_general over all heads (the leading-dim fold Mosaic
    may accept, unlike the rejected (TB,N,h,d)->(TB*h,N,d) transpose
    relayout — needs small TB: logits are (h*TB, N, N) fp32 in VMEM);
    'pipelined' = identical math, software-pipelined head loop (head h+1's
    QK^T is issued before head h's softmax/AV so independent MXU and VPU
    work sits adjacent in the instruction stream — attacks the per-head
    MXU-idle-during-softmax serialisation the r3 plateau analysis names);
    'phasesplit' = three strict phases: all per-head QK^T stacked on a NEW
    LEADING axis (a sublane stack, not the lane relayout Mosaic rejects),
    ONE batched softmax pass over every head's logits, then all per-head
    AV — fewer, bigger VPU ops at the cost of phase barriers;
    'hmqkv' = heads packed at the WEIGHT level outside the kernel
    (wqkv stacked (h, C, 3d), wp split (h, d, C)) so the qkv projection
    is an h-batched dot emitting head-major output directly and the whole
    stage runs with zero in-kernel lane shuffles (`batched` minus its
    3+1 per-head scratch/output copies; see _attn_stage_kernel_hm).

    Per-stage overrides D3DP_ATTN_VARIANT_T (temporal, n_tokens>=128) /
    D3DP_ATTN_VARIANT_S (spatial) take precedence over the global switch:
    the r3 long-window sweep measured `batched` at −8.7% on the temporal
    stage but +55% on the spatial one, so the two stages want different
    variants.

    DEFAULT (r3 promotion): with no variant env set at all, the TEMPORAL
    stage runs `batched` — measured −3.7% in-model, same-window paired
    (129.3 → 124.5 ms/fwd; scripts/r3_batched_paired.sh), fp32 output
    bit-exact vs the loop (test_stage_kernel_variants_agree atol=0).
    `D3DP_ATTN_VARIANT_T=loop` forces the per-head loop back."""
    if n_tokens is not None:
        key = ("D3DP_ATTN_VARIANT_T" if n_tokens >= 128
               else "D3DP_ATTN_VARIANT_S")
        v = os.environ.get(key)
        if v is not None:
            return v
        v = os.environ.get("D3DP_ATTN_VARIANT")
        if v is not None:
            return v
        return "batched" if n_tokens >= 128 else ""
    return os.environ.get("D3DP_ATTN_VARIANT", "")


def _spatial_group():
    """Grouped spatial attention (kernel-lab; D3DP_SPATIAL_GROUP=g): fold g
    17-token sequences into one (g*17)-token attention with a block-diagonal
    additive mask. The (R, 17, C) -> (R/g, g*17, C) fold is a row-major
    bitcast in HBM (free), LN/projections are row-wise (unaffected), and the
    masked softmax is mathematically exact — but every MXU op becomes g x
    bigger, attacking the 13%-MXU-fill intrinsic to the 17-token shape.
    Eval/sampling-path only (the stage VJP refuses it)."""
    v = os.environ.get("D3DP_SPATIAL_GROUP", "")
    return int(v) if v else 0


def _attn_stage_kernel(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, ln1s_ref,
                       ln1b_ref, ln2s_ref, ln2b_ref, *args, scale, num_heads,
                       head_dim, eps, f32_prec, mask_block=0, variant="",
                       has_dp=False):
    """The ENTIRE pre-LN attention stage in one VMEM pass:
    LN1 -> qkv projection -> attention -> out-projection -> residual ->
    LN2. Reads the residual stream once (3 activation passes of HBM traffic
    instead of ~14 for the XLA composition).

    has_dp: a per-row DropPath scale vector (tb, 1) arrives as the last
    input; the attention branch (out-projection incl. its bias) is scaled
    by it before the residual add — stochastic depth without leaving the
    fused path (the TRAIN forward's reason to exist; reference
    mixste.py:114)."""
    if has_dp:
        dp_ref, x2_ref, y2_ref, acc_ref, *scratch = args
    else:
        dp_ref = None
        x2_ref, y2_ref, acc_ref, *scratch = args
    C = num_heads * head_dim
    prec = jax.lax.Precision.HIGHEST if f32_prec else None
    TB, N = x_ref.shape[0], x_ref.shape[1]

    x32 = x_ref[:].astype(jnp.float32).reshape(TB * N, C)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y1 = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y1 = y1 * ln1s_ref[:].astype(jnp.float32) + ln1b_ref[:].astype(jnp.float32)

    qkv = jax.lax.dot_general(
        y1.astype(x_ref.dtype), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    qkv = qkv.reshape(TB, N, 3 * C)

    fold_div = (not f32_prec) and os.environ.get("D3DP_SOFTMAX_FOLD", "1") == "1"
    mask = None
    if mask_block:
        # block-diagonal additive mask for grouped spatial attention:
        # token i may attend token j only within its own original sequence
        bi = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) // mask_block
        bj = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1) // mask_block
        mask = jnp.where(bi == bj, 0.0, -1e30).astype(jnp.float32)
    if variant == "batched":
        assert mask is None, "grouped+batched variants do not compose"
        qs_ref, ks_ref, vs_ref = scratch
        _stage_heads_batched(qkv, acc_ref, qs_ref, ks_ref, vs_ref, num_heads,
                             head_dim, C, scale, prec, fold_div, TB, N)
    elif variant == "pipelined":
        _stage_heads_pipelined(qkv, acc_ref, num_heads, head_dim, C, scale,
                               prec, fold_div, mask=mask)
    elif variant == "phasesplit":
        _stage_heads_phasesplit(qkv, acc_ref, num_heads, head_dim, C, scale,
                                prec, fold_div, mask=mask)
    else:
        _stage_heads_loop(qkv, acc_ref, num_heads, head_dim, C, scale, prec,
                          fold_div, bf16_exp=(variant == "bf16exp"
                                              and not f32_prec), mask=mask)

    # flattened (TB*N, C) M-dim for the out-projection — rank-3 contractions
    # measured slower in Mosaic (same finding as the MLP kernel, r2 sweep)
    proj = jax.lax.dot_general(
        acc_ref[:].reshape(TB * N, C), wp_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec).reshape(TB, N, C)
    branch = proj + bp_ref[:].astype(jnp.float32)
    if has_dp:
        branch = branch * dp_ref[:].astype(jnp.float32)  # (TB, 1, 1)
    x2 = x_ref[:].astype(jnp.float32) + branch
    x2_ref[:] = x2.astype(x2_ref.dtype)

    if variant == "noy2":
        # lab-only upper bound: skip LN2 + the y2 output entirely to
        # measure what moving LN2 into the consumer kernel could save
        return
    mu2 = jnp.mean(x2, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(x2 - mu2), axis=-1, keepdims=True)
    y2 = (x2 - mu2) * jax.lax.rsqrt(var2 + eps)
    y2 = y2 * ln2s_ref[:].astype(jnp.float32) + ln2b_ref[:].astype(
        jnp.float32)
    y2_ref[:] = y2.astype(y2_ref.dtype)


def _attn_stage_kernel_hm(x_ref, wqkv_hm_ref, bqkv_hm_ref, wp_ref, bp_ref,
                          ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, x2_ref,
                          y2_ref, acc_ref, *, scale, num_heads, head_dim, eps,
                          f32_prec):
    """Head-major attention stage (variant 'hmqkv') — the VERDICT-r2
    "pack heads at the WEIGHT level" idea made concrete: the qkv weights
    arrive pre-stacked (h, C, 3d), so per-head projection dots emit
    head-major output directly (leading-axis stores, no q/k/v lane-slice
    copies) and the QK^T/AV dots run h-batched.

    MEASURED AND CLOSED (r4, PERFORMANCE.md "r4 hmqkv cells"): loses
    +21% per stage (+42% both) vs the batched/loop defaults on v5e —
    the head-blocked projection dots tile worse than the lane shuffles
    they remove. Kept as the documented experiment; do not re-promote
    without new hardware. The `batched` variant
    pays 3+1 per-head scratch/output copies per tile; this keeps only the
    single output-side scatter (o back to packed lanes for the standard
    (TB*N, C) @ (C, C) projection). Mosaic constraints that shaped it,
    all hit on real v5e hardware (interpret mode accepts everything):
    h-batched dot over a broadcast lhs CRASHES the compiler; any
    (TB*N, L) <-> (TB, N, L) shape cast with L not a multiple of 128
    lanes (N=243 unaligned sublanes) is rejected, which kills both the
    (h, TB*N, 3d) -> (h*TB, N, 3d) view and the head-major per-head
    out-projection (its rank-3 64-lane lhs auto-flattens)."""
    C = num_heads * head_dim
    d = head_dim
    prec = jax.lax.Precision.HIGHEST if f32_prec else None
    TB, N = x_ref.shape[0], x_ref.shape[1]

    # Everything stays rank-3: N=243 is not sublane-aligned, so any
    # (TB*N, ·) <-> (TB, N, ·) reshape is an unsupported Mosaic shape cast
    # on real hardware ("infer-vector-layout: unsupported shape cast",
    # vector<1944x192> -> vector<8x243x192>). Interpret mode accepts both.
    x32 = x_ref[:].astype(jnp.float32)  # (TB, N, C)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y1 = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y1 = y1 * ln1s_ref[:].astype(jnp.float32) + ln1b_ref[:].astype(jnp.float32)
    y1c = y1.astype(x_ref.dtype)

    # Per-head qkv projection dots emitting head-major output directly.
    # (An h-batched dot over a broadcast lhs — jnp.broadcast_to(y1c, (h,
    # TB*N, C)) — CRASHES Mosaic on real hardware: `Check failed:
    # limits[i] <= dim(i)` slicing the size-1 broadcast dim. Unrolling the
    # batch axis keeps the zero-shuffle property: each (TB, N, C) @ (C, 3d)
    # output is STORED into its leading-axis slot, never lane-sliced.)
    parts = []
    for hi in range(num_heads):
        ph = jax.lax.dot_general(
            y1c, wqkv_hm_ref[hi], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        ph = (ph + bqkv_hm_ref[hi].astype(jnp.float32)).astype(x_ref.dtype)
        parts.append(ph)
    qkv_hm = jnp.concatenate(parts, axis=0)  # (h*TB, N, 3d)
    q = qkv_hm[..., :d]
    k = qkv_hm[..., d : 2 * d]
    v = qkv_hm[..., 2 * d :]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    fold_div = (not f32_prec) and os.environ.get("D3DP_SOFTMAX_FOLD", "1") == "1"
    if fold_div:
        o = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        o = o * (1.0 / l)
    else:
        a = (p / l).astype(v.dtype)
        o = jax.lax.dot_general(
            a, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)

    # Output side: scatter o back to the standard packed layout (h lane-
    # offset stores into acc — the ONE copy set this variant keeps; a
    # head-major per-head out-projection dot auto-flattens its rank-3
    # 64-lane lhs into the same unsupported (8,243,64)->(1944,64) cast) and
    # reuse the proven flattened (TB*N, C) @ (C, C) projection — its
    # merge IS supported because C=512 lanes is whole vregs.
    oc = o.astype(x_ref.dtype)
    for hi in range(num_heads):
        acc_ref[:, :, hi * d : (hi + 1) * d] = oc[hi * TB : (hi + 1) * TB]
    proj = jax.lax.dot_general(
        acc_ref[:].reshape(TB * N, C), wp_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec).reshape(TB, N, C)

    x2 = x_ref[:].astype(jnp.float32) + proj + bp_ref[:].astype(jnp.float32)
    x2_ref[:] = x2.astype(x2_ref.dtype)
    mu2 = jnp.mean(x2, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(x2 - mu2), axis=-1, keepdims=True)
    y2 = (x2 - mu2) * jax.lax.rsqrt(var2 + eps)
    y2 = y2 * ln2s_ref[:].astype(jnp.float32) + ln2b_ref[:].astype(
        jnp.float32)
    y2_ref[:] = y2.astype(y2_ref.dtype)


def _stage_heads_loop(qkv, acc_ref, num_heads, head_dim, C, scale, prec,
                      fold_div, bf16_exp=False, mask=None):
    for hi in range(num_heads):
        q = qkv[:, :, hi * head_dim : (hi + 1) * head_dim]
        k = qkv[:, :, C + hi * head_dim : C + (hi + 1) * head_dim]
        v = qkv[:, :, 2 * C + hi * head_dim : 2 * C + (hi + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec) * scale
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        if bf16_exp:
            # experimental: exp over bf16 logits (max still fp32-stable);
            # halves the dominant VPU softmax traffic on the bf16 path
            p = jnp.exp((s - m).astype(jnp.bfloat16))
            l = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        else:
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
        if fold_div:
            # fold the softmax normaliser into the (N, d) output instead of
            # dividing the (N, N) probabilities: ~N/d fewer VPU divisions.
            # Mathematically identical; bf16-only (fp32 parity path keeps
            # the reference op order bit-for-bit)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec)
            o = o * (1.0 / l)
        else:
            a = (p / l).astype(v.dtype)
            o = jax.lax.dot_general(
                a, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec)
        acc_ref[:, :, hi * head_dim : (hi + 1) * head_dim] = o.astype(
            acc_ref.dtype)


def _stage_heads_pipelined(qkv, acc_ref, num_heads, head_dim, C, scale, prec,
                           fold_div, mask=None):
    """Software-pipelined head loop — IDENTICAL math to _stage_heads_loop,
    only the issue order differs: head h+1's QK^T (MXU) is emitted before
    head h's softmax (VPU) + AV, giving the scheduler adjacent independent
    MXU/VPU work instead of a strict QK->softmax->AV dependency chain per
    head."""
    def _qk(hi):
        q = qkv[:, :, hi * head_dim : (hi + 1) * head_dim]
        k = qkv[:, :, C + hi * head_dim : C + (hi + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec) * scale
        return s if mask is None else s + mask

    def _finish(hi, s):
        v = qkv[:, :, 2 * C + hi * head_dim : 2 * C + (hi + 1) * head_dim]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if fold_div:
            o = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec)
            o = o * (1.0 / l)
        else:
            a = (p / l).astype(v.dtype)
            o = jax.lax.dot_general(
                a, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec)
        acc_ref[:, :, hi * head_dim : (hi + 1) * head_dim] = o.astype(
            acc_ref.dtype)

    s_prev = _qk(0)
    for hi in range(1, num_heads):
        s_cur = _qk(hi)
        _finish(hi - 1, s_prev)
        s_prev = s_cur
    _finish(num_heads - 1, s_prev)


def _stage_heads_phasesplit(qkv, acc_ref, num_heads, head_dim, C, scale, prec,
                            fold_div, mask=None):
    """Three strict phases: (1) every head's QK^T, stacked along a NEW
    leading axis (sublane stack — no lane relayout); (2) ONE softmax pass
    over the (h, TB, N, N) stack — a single big VPU loop instead of h
    small ones serialised between matmuls; (3) every head's AV. VMEM cost:
    the full fp32 logit stack lives at once (temporal tb=8: ~15 MB)."""
    s = jnp.stack([
        jax.lax.dot_general(
            qkv[:, :, hi * head_dim : (hi + 1) * head_dim],
            qkv[:, :, C + hi * head_dim : C + (hi + 1) * head_dim],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        for hi in range(num_heads)]) * scale
    if mask is not None:
        s = s + mask
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if not fold_div:
        p = p / l
    for hi in range(num_heads):
        v = qkv[:, :, 2 * C + hi * head_dim : 2 * C + (hi + 1) * head_dim]
        o = jax.lax.dot_general(
            p[hi].astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        if fold_div:
            o = o * (1.0 / l[hi])
        acc_ref[:, :, hi * head_dim : (hi + 1) * head_dim] = o.astype(
            acc_ref.dtype)


def _stage_heads_batched(qkv, acc_ref, qs_ref, ks_ref, vs_ref, num_heads,
                         head_dim, C, scale, prec, fold_div, TB, N):
    """All heads in ONE batched dot_general pair: per-head lane slices are
    copied into head-major (h*TB, N, d) scratch (a lane-shift copy, not the
    transpose relayout Mosaic rejects), the (h*TB)-batched contractions run
    as single ops, and the outputs are copied back to the packed lanes."""
    for hi in range(num_heads):
        rows = slice(hi * TB, (hi + 1) * TB)
        qs_ref[rows] = qkv[:, :, hi * head_dim : (hi + 1) * head_dim]
        ks_ref[rows] = qkv[:, :, C + hi * head_dim : C + (hi + 1) * head_dim]
        vs_ref[rows] = qkv[:, :, 2 * C + hi * head_dim
                           : 2 * C + (hi + 1) * head_dim]
    s = jax.lax.dot_general(
        qs_ref[:], ks_ref[:], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if fold_div:
        o = jax.lax.dot_general(
            p.astype(vs_ref.dtype), vs_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        o = o * (1.0 / l)
    else:
        a = (p / l).astype(vs_ref.dtype)
        o = jax.lax.dot_general(
            a, vs_ref[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
    o = o.astype(acc_ref.dtype)
    for hi in range(num_heads):
        acc_ref[:, :, hi * head_dim : (hi + 1) * head_dim] = (
            o[hi * TB : (hi + 1) * TB])


@partial(jax.jit, static_argnames=("num_heads", "scale", "eps", "interpret",
                                   "tb"))
def _attention_stage_fwd(x, wqkv, bqkv, wp, bp, ln1_s, ln1_b, ln2_s, ln2_b,
                         num_heads, scale, eps, interpret=None, tb=None,
                         dp_row=None):
    B0, N0, C = x.shape
    B, N = B0, N0
    mask_block = 0
    group = _spatial_group()
    if dp_row is not None:
        # DropPath-scaled training path: the grouped/hmqkv lab variants
        # are eval experiments — route to the production kernels
        group = 1
    if group > 1 and N0 <= 32 and B0 % group == 0:
        # grouped spatial attention: row-major bitcast fold + masked softmax
        # (exact; see _spatial_group). LN/projections are row-wise so only
        # the attention semantics need the mask.
        mask_block = N0
        B, N = B0 // group, group * N0
        x = x.reshape(B, N, C)
    d = C // num_heads
    variant = _stage_variant(N0)
    if dp_row is not None and variant not in ("", "batched", "bf16exp"):
        variant = ""  # lab variants don't carry the DropPath input
    if interpret is None:
        interpret = _interpret_default()
    if (variant == "batched" and not interpret
            and "D3DP_ATTN_VARIANT_T" not in os.environ
            and "D3DP_ATTN_VARIANT" not in os.environ):
        _announce_batched_default()
    if tb is None:
        if mask_block:
            tb = _env_tile("D3DP_TB_ATTN_G")
        else:
            tb = _env_tile("D3DP_TB_ATTN_T" if N >= 128 else "D3DP_TB_ATTN_S")
        if tb is None and variant == "batched":
            # batched keeps (num_heads*tb, N, d) q/k/v scratch + an
            # (num_heads*tb, N, N) fp32 logits stack in VMEM — the r3
            # long-window sweep measured tb=4 as the temporal winner and
            # bigger tiles blow the VMEM budget
            tb = 4
    if tb is None:
        tb = _tile_rows(B, N) if N >= 128 else max(_tile_rows(B, N) // 2, 1)
    tb = max(min(tb, B), 1)
    while B % tb:
        tb -= 1

    mem = pl.ANY if interpret else pltpu.VMEM
    row_spec = pl.BlockSpec((tb, N, C), lambda i: (i, 0, 0), memory_space=mem)
    wq_spec = pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=mem)
    wp_spec = pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=mem)
    vc_spec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=mem)
    v3_spec = pl.BlockSpec((1, 3 * C), lambda i: (0, 0), memory_space=mem)

    if variant == "hmqkv" and not mask_block:
        # pack heads at the WEIGHT level, outside the kernel: qkv weights
        # stacked head-major (h, C, 3d), bias (h, 1, 3d); the out-
        # projection stays the standard (C, C) (the head-major per-head
        # projection dot is Mosaic-unsupported — see kernel docstring)
        h = num_heads
        wqkv_hm = jnp.stack([
            jnp.concatenate([wqkv[:, i * d : (i + 1) * d],
                             wqkv[:, C + i * d : C + (i + 1) * d],
                             wqkv[:, 2 * C + i * d : 2 * C + (i + 1) * d]],
                            axis=1)
            for i in range(h)])
        b3 = bqkv.reshape(3, h, d)
        bqkv_hm = jnp.stack([
            jnp.concatenate([b3[0, i], b3[1, i], b3[2, i]]) for i in range(h)
        ]).reshape(h, 1, 3 * d)
        whm_spec = pl.BlockSpec((h, C, 3 * d), lambda i: (0, 0, 0),
                                memory_space=mem)
        bhm_spec = pl.BlockSpec((h, 1, 3 * d), lambda i: (0, 0, 0),
                                memory_space=mem)
        return pl.pallas_call(
            partial(_attn_stage_kernel_hm, scale=scale, num_heads=h,
                    head_dim=d, eps=eps, f32_prec=(x.dtype == jnp.float32)),
            out_shape=(
                jax.ShapeDtypeStruct((B, N, C), x.dtype),
                jax.ShapeDtypeStruct((B, N, C), x.dtype),
            ),
            grid=(B // tb,),
            in_specs=[row_spec, whm_spec, bhm_spec, wp_spec, vc_spec,
                      vc_spec, vc_spec, vc_spec, vc_spec],
            out_specs=(row_spec, row_spec),
            scratch_shapes=[pltpu.VMEM((tb, N, C), x.dtype)],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=(2 * B * N * C * 3 * C + 2 * 2 * B * N * N * C
                       + 2 * B * N * C * C),
                bytes_accessed=3 * B * N * C * x.dtype.itemsize,
                transcendentals=B * num_heads * N * N,
            ),
        )(x, wqkv_hm, bqkv_hm, wp, bp.reshape(1, C), ln1_s.reshape(1, C),
          ln1_b.reshape(1, C), ln2_s.reshape(1, C), ln2_b.reshape(1, C))

    in_specs = [row_spec, wq_spec, v3_spec, wp_spec, vc_spec, vc_spec,
                vc_spec, vc_spec, vc_spec]
    inputs = [x, wqkv, bqkv.reshape(1, 3 * C), wp, bp.reshape(1, C),
              ln1_s.reshape(1, C), ln1_b.reshape(1, C), ln2_s.reshape(1, C),
              ln2_b.reshape(1, C)]
    if dp_row is not None:
        # (B, 1, 1) with a (tb, 1, 1) block: Mosaic constrains the LAST TWO
        # block dims (divisible by (8, 128) or equal to the array dims) —
        # trailing singletons satisfy 'equal', leaving tb unconstrained
        in_specs.append(pl.BlockSpec((tb, 1, 1), lambda i: (i, 0, 0),
                                     memory_space=mem))
        inputs.append(dp_row.astype(jnp.float32).reshape(B, 1, 1))
    x2, y2 = pl.pallas_call(
        partial(_attn_stage_kernel, scale=scale, num_heads=num_heads,
                head_dim=d, eps=eps, f32_prec=(x.dtype == jnp.float32),
                mask_block=mask_block, variant=variant,
                has_dp=dp_row is not None),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
        ),
        grid=(B // tb,),
        in_specs=in_specs,
        out_specs=(row_spec, row_spec),
        scratch_shapes=[pltpu.VMEM((tb, N, C), x.dtype)] + (
            [pltpu.VMEM((num_heads * tb, N, d), x.dtype)] * 3
            if variant == "batched" else []),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(2 * B * N * C * 3 * C + 2 * 2 * B * N * N * C
                   + 2 * B * N * C * C),
            bytes_accessed=3 * B * N * C * x.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
    )(*inputs)
    if mask_block:
        x2 = x2.reshape(B0, N0, C)
        y2 = y2.reshape(B0, N0, C)
    return x2, y2


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def attention_stage_p(x, wqkv, bqkv, wp, bp, ln1_s, ln1_b, ln2_s, ln2_b,
                      num_heads, scale, eps):
    """Whole pre-LN attention stage, fused: (x2, y2) where
    x2 = x + proj(attn(qkv(LN1(x)))) and y2 = LN2(x2)."""
    return _attention_stage_fwd(x, wqkv, bqkv, wp, bp, ln1_s, ln1_b, ln2_s,
                                ln2_b, num_heads, scale, eps)


def _attention_stage_p_fwd(x, wqkv, bqkv, wp, bp, ln1_s, ln1_b, ln2_s, ln2_b,
                           num_heads, scale, eps):
    out = _attention_stage_fwd(x, wqkv, bqkv, wp, bp, ln1_s, ln1_b, ln2_s,
                               ln2_b, num_heads, scale, eps)
    return out, (x, wqkv, bqkv, wp, ln1_s, ln1_b, ln2_s, out[0])


def _attention_stage_p_bwd(num_heads, scale, eps, resids, grads):
    """Backward: XLA recompute of LN1/qkv + the Pallas attention fwd/bwd
    kernels for the attention core; weight grads are XLA batch reductions."""
    return _stage_bwd_impl(num_heads, scale, eps, resids, grads, dp_row=None)


def _stage_bwd_impl(num_heads, scale, eps, resids, grads, dp_row=None):
    """Shared stage backward. With dp_row (per-row DropPath scale s):
    x2 = x + s*(a @ wp + bp), so the branch-side cotangent is s*ds while
    the residual passthrough to x stays unscaled.

    Matmul operands run in the FORWARD's compute dtype (`md`) with fp32
    accumulation: fp32 keeps the HIGHEST-precision passes (grad-parity
    tests pin ≤2e-4 vs XLA autodiff); bf16 keeps the MXU on bf16 passes —
    upcasting the einsum operands to fp32 here quartered the backward's
    matmul rate on v5e and made the fused train step SLOWER than the
    composed path (r4 train lab, PERFORMANCE.md)."""
    x, wqkv, bqkv, wp, ln1_s, ln1_b, ln2_s, x2 = resids
    gx2, gy2 = grads

    from d3dp_tpu.ops.norm import _ln_bwd_rows

    B, N, C = x.shape
    if _spatial_group() > 1 and N <= 32 and B % _spatial_group() == 0:
        raise NotImplementedError(
            "D3DP_SPATIAL_GROUP is an eval/sampling-path optimization; the "
            "stage backward recomputes ungrouped attention — unset the env "
            "var for training")
    md = x.dtype  # matmul operand dtype (the forward kernel's compute dtype)
    prec = jax.lax.Precision.HIGHEST if md == jnp.float32 else None
    f32 = jnp.float32

    # recompute forward intermediates
    x32 = x.astype(f32).reshape(B * N, C)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * rstd
    y1 = (xhat * ln1_s.astype(f32) + ln1_b.astype(f32)).astype(md)
    # same matmul precision as the forward kernel (fp32 defaults low here)
    qkv = jnp.matmul(y1, wqkv.astype(md),
                     precision=prec).reshape(B, N, 3 * C)
    qkv = qkv + bqkv.astype(qkv.dtype)
    a = fused_attention_qkv(qkv, num_heads, scale)

    # LN2 backward
    ds, dln2_s, dln2_b = _ln_bwd_rows(
        x2.reshape(B * N, C).astype(f32), ln2_s,
        gy2.reshape(B * N, C), eps)
    ds = ds.reshape(B, N, C)
    if gx2 is not None:
        ds = ds + gx2.astype(f32)

    # x2 = x + [s *] (a @ wp + bp)
    ds_b = ds if dp_row is None else \
        ds * dp_row.astype(f32).reshape(-1, 1, 1)
    ds_m = ds_b.astype(md)
    dwp = jnp.einsum("bnc,bnd->cd", a.astype(md), ds_m, precision=prec,
                     preferred_element_type=f32).astype(wp.dtype)
    dbp = jnp.sum(ds_b, axis=(0, 1)).astype(wp.dtype)
    da = jnp.einsum("bnd,cd->bnc", ds_m, wp.astype(md), precision=prec,
                    preferred_element_type=f32).astype(qkv.dtype)
    dqkv = _fused_attention_qkv_bwd(qkv, da, num_heads, scale)

    dqkv_m = dqkv.reshape(B * N, 3 * C).astype(md)
    dbqkv = jnp.sum(dqkv_m.astype(f32), axis=0).astype(wqkv.dtype)
    dwqkv = jnp.einsum("rc,rk->ck", y1, dqkv_m, precision=prec,
                       preferred_element_type=f32).astype(wqkv.dtype)
    dy1 = jnp.einsum("rk,ck->rc", dqkv_m, wqkv.astype(md), precision=prec,
                     preferred_element_type=f32)

    # LN1 backward (reuse stats)
    gs1 = dy1 * ln1_s.astype(jnp.float32)
    dx1 = rstd * (gs1 - jnp.mean(gs1, axis=-1, keepdims=True)
                  - xhat * jnp.mean(gs1 * xhat, axis=-1, keepdims=True))
    dln1_s = jnp.sum(dy1 * xhat, axis=0).astype(ln1_s.dtype)
    dln1_b = jnp.sum(dy1, axis=0).astype(ln1_s.dtype)

    dx = (ds + dx1.reshape(B, N, C)).astype(x.dtype)
    return (dx, dwqkv, dbqkv, dwp, dbp, dln1_s, dln1_b,
            dln2_s.astype(ln2_s.dtype), dln2_b.astype(ln2_s.dtype))


attention_stage_p.defvjp(_attention_stage_p_fwd, _attention_stage_p_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def attention_stage_dp_p(x, wqkv, bqkv, wp, bp, ln1_s, ln1_b, ln2_s, ln2_b,
                         dp_row, num_heads, scale, eps):
    """attention_stage_p with per-row DropPath (stochastic depth):
    x2 = x + dp_row*(proj(attn(qkv(LN1(x)))) incl. proj bias), y2 = LN2(x2).
    dp_row: (B,) scale vector (bernoulli(keep)/keep draws, or any per-row
    scale); non-differentiable (zero cotangent). This keeps the TRAINING
    forward on the fused two-kernel-per-block path — the reference trains
    with drop_path_rate=0.1 (diffusionpose.py:121-123)."""
    return _attention_stage_fwd(x, wqkv, bqkv, wp, bp, ln1_s, ln1_b, ln2_s,
                                ln2_b, num_heads, scale, eps, dp_row=dp_row)


def _attention_stage_dp_p_fwd(x, wqkv, bqkv, wp, bp, ln1_s, ln1_b, ln2_s,
                              ln2_b, dp_row, num_heads, scale, eps):
    out = _attention_stage_fwd(x, wqkv, bqkv, wp, bp, ln1_s, ln1_b, ln2_s,
                               ln2_b, num_heads, scale, eps, dp_row=dp_row)
    return out, (x, wqkv, bqkv, wp, ln1_s, ln1_b, ln2_s, out[0], dp_row)


def _attention_stage_dp_p_bwd(num_heads, scale, eps, resids, grads):
    dp_row = resids[-1]
    base = _stage_bwd_impl(num_heads, scale, eps, resids[:-1], grads,
                           dp_row=dp_row)
    return base + (jnp.zeros_like(dp_row),)


attention_stage_dp_p.defvjp(_attention_stage_dp_p_fwd,
                            _attention_stage_dp_p_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def attention_block_p(qkv, res, w, b, ln_scale, ln_bias, num_heads,
                      scale, eps):
    """Fused attention + out-projection + residual + LayerNorm.

    qkv: (B, N, 3C) fused projection; res: (B, N, C) residual stream;
    w/b: out-projection weights (C, C)/(C,). Returns (x2, LN(x2)).
    """
    return _attention_block_fwd(qkv, res, w, b, ln_scale, ln_bias,
                                num_heads, scale, eps)


def _attention_block_p_fwd(qkv, res, w, b, ln_scale, ln_bias, num_heads,
                           scale, eps):
    out = _attention_block_fwd(qkv, res, w, b, ln_scale, ln_bias,
                               num_heads, scale, eps)
    return out, (qkv, res, w, ln_scale, out[0])


def _attention_block_p_bwd(num_heads, scale, eps, resids, grads):
    """Backward: recompute attention with the Pallas forward kernel, push
    the projection/LN chain through XLA, and reuse the flash-style Pallas
    attention backward for d(qkv). Weight grads are batch reductions, which
    XLA already does at speed-of-light."""
    qkv, res, w, ln_scale, x2 = resids
    gx2, gy2 = grads

    from d3dp_tpu.ops.norm import _ln_bwd_rows

    B, N, C = x2.shape
    ds, dln_scale, dln_bias = _ln_bwd_rows(
        x2.reshape(B * N, C).astype(jnp.float32), ln_scale,
        gy2.reshape(B * N, C), eps)
    ds = ds.reshape(B, N, C)
    if gx2 is not None:
        ds = ds + gx2.astype(jnp.float32)

    # out = res + (a @ w + b)
    dres = ds.astype(res.dtype)
    a = fused_attention_qkv(qkv, num_heads, scale)  # recompute (pallas fwd)
    prec = (jax.lax.Precision.HIGHEST if qkv.dtype == jnp.float32 else None)
    dw = jnp.einsum("bnc,bnd->cd", a.astype(jnp.float32), ds,
                    precision=prec).astype(w.dtype)
    db = jnp.sum(ds, axis=(0, 1)).astype(w.dtype)
    da = jnp.einsum("bnd,cd->bnc", ds, w.astype(jnp.float32),
                    precision=prec).astype(qkv.dtype)
    dqkv = _fused_attention_qkv_bwd(qkv, da, num_heads, scale)
    return (dqkv, dres, dw, db, dln_scale.astype(ln_scale.dtype),
            dln_bias.astype(ln_scale.dtype))


attention_block_p.defvjp(_attention_block_p_fwd, _attention_block_p_bwd)


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
        interpret = _interpret_default()
    if tb is None:
        tb = _env_tile("D3DP_TB_QKV_T" if N >= 128 else "D3DP_TB_QKV_S") \
            or _tile_rows(B, N)
        while B % tb:
            tb -= 1

    in_spec = pl.BlockSpec(
        (tb, N, C3), lambda i: (i, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (tb, N, C), lambda i: (i, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM)
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
