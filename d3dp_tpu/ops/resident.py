"""Depth-resident MixSTE block-stack kernel: the whole 2*depth-block trunk
in ONE Pallas call, with the residual stream living in VMEM across depths.

This is the cross-block-residency design PERFORMANCE.md names as the last
structural jump: the r2 two-kernel pipeline (attention-stage + transposing
MLP, d3dp_tpu/ops/{attention,mlp}.py) round-trips the (B, F, J, C) stream
through HBM ~6 times per block — 32 kernel launches and ~16 GB of activation
DMA per forward at the flagship eval shape. Here the grid is
(batch_row, depth): TPU grid steps execute sequentially on the core, so a
VMEM scratch holding one row's full (F, J, C) stream (4.2 MB bf16 at
243x17x512) persists across the depth dimension while per-depth weights
(~8 MB/depth) stream in as blocked inputs that Pallas double-buffers. The
stream touches HBM exactly twice: the initial read and the final write.

Compile-size discipline (the 600 s foreground window bounds one Mosaic
compile): the kernel body contains ONE spatial stage+MLP and ONE temporal
stage+MLP, each inside a `fori_loop` over equal-size chunks whose starts
clamp to the array end — overlapping rows recompute byte-identical values
into disjoint-or-identical stores, so the overlap is idempotent. Chunk
sizes are chosen to match the r2-tuned per-kernel tiles (spatial ~1.4k
tokens, temporal ~9 sequences), so in-body MXU/VPU efficiency matches the
measured per-kernel kernels and the win is purely the removed HBM
round-trips + 30 of 32 kernel boundaries.

Math is the level-4 fused path verbatim (same helpers, same op order, same
fp32 islands, same D3DP_SOFTMAX_FOLD / D3DP_ATTN_VARIANT=bf16exp /
D3DP_MLP_VARIANT switches), with x2/y2 cast to the compute dtype between
stage and MLP to mirror the level-4 HBM round-trip bit-for-bit. Exactness
vs the level-4 path is pinned by tests/test_resident.py.

Sampling/eval only (no VJP): training keeps the level-4 kernels, whose
custom VJPs are qualified. Replaces the same reference op as the per-block
kernels (/root/reference/common/mixste.py:84-298).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3dp_tpu.ops.attention import _interpret_default, _stage_heads_loop
from d3dp_tpu.ops.mlp import _gelu_inkernel


def _stage_math(x, wqkv, bqkv, wp, vec_ref, acc_ref, *, num_heads, head_dim,
                scale, eps, f32_prec, fold_div, bf16_exp):
    """Value-level pre-LN attention stage: LN1 -> qkv -> heads -> proj ->
    residual -> LN2. Mirrors ops/attention.py::_attn_stage_kernel op for op
    (the head loop IS that kernel's helper). vec_ref rows: [bp, ln1s, ln1b,
    ln2s, ln2b, b2mlp] (the b2 row belongs to the MLP and is read there)."""
    rows, N, C = x.shape
    prec = jax.lax.Precision.HIGHEST if f32_prec else None

    x32 = x.astype(jnp.float32).reshape(rows * N, C)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y1 = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y1 = (y1 * vec_ref[0, 1:2].astype(jnp.float32)
          + vec_ref[0, 2:3].astype(jnp.float32))

    qkv = jax.lax.dot_general(
        y1.astype(x.dtype), wqkv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    qkv = (qkv + bqkv.astype(jnp.float32)).astype(x.dtype)
    qkv = qkv.reshape(rows, N, 3 * C)

    _stage_heads_loop(qkv, acc_ref, num_heads, head_dim, C, scale, prec,
                      fold_div, bf16_exp=bf16_exp)

    proj = jax.lax.dot_general(
        acc_ref[:].reshape(rows * N, C), wp,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec).reshape(
            rows, N, C)
    x2 = (x.astype(jnp.float32) + proj
          + vec_ref[0, 0:1].astype(jnp.float32))

    mu2 = jnp.mean(x2, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(x2 - mu2), axis=-1, keepdims=True)
    y2 = (x2 - mu2) * jax.lax.rsqrt(var2 + eps)
    y2 = (y2 * vec_ref[0, 3:4].astype(jnp.float32)
          + vec_ref[0, 4:5].astype(jnp.float32))
    # cast to the compute dtype exactly where the level-4 pipeline writes
    # x2/y2 to HBM — keeps the two paths bit-identical
    return x2.astype(x.dtype), y2.astype(x.dtype)


def _mlp_math(y2, x2, w1, b1, w2, vec_ref, shared_ref, shared_row, *, eps,
              f32_prec):
    """Value-level fused MLP block (ops/mlp.py::_mlp_block_kernel op for
    op): fc1 -> erf GELU -> fc2 -> residual -> SHARED LayerNorm. y2/x2:
    (tokens, C) in the compute dtype; shared_ref rows [shared_row,
    shared_row+1] are the shared norm's scale/bias."""
    prec = jax.lax.Precision.HIGHEST if f32_prec else None
    h = jax.lax.dot_general(
        y2, w1, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    h = _gelu_inkernel(h + b1.astype(jnp.float32), f32_prec)
    out = jax.lax.dot_general(
        h.astype(y2.dtype), w2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    s = (x2.astype(jnp.float32) + out
         + vec_ref[0, 5:6].astype(jnp.float32))

    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    y = (s - mu) * jax.lax.rsqrt(var + eps)
    y = (y * shared_ref[shared_row : shared_row + 1].astype(jnp.float32)
         + shared_ref[shared_row + 1 : shared_row + 2].astype(jnp.float32))
    return y.astype(y2.dtype)


def _resident_kernel(
        x_ref, tpos_ref,
        s_wqkv, s_bqkv, s_wp, s_w1, s_b1, s_w2, s_vec,
        t_wqkv, t_bqkv, t_wp, t_w1, t_b1, t_w2, t_vec,
        shared_ref,
        o_ref,
        stream_ref, stage_s_ref, stream_t_ref, stage_t_ref,
        acc_s_ref, acc_t_ref,
        *, depth, num_heads, head_dim, scale, eps, f32_prec, fold_div,
        bf16_exp, csf, ncf, cst, nct, F, J, C):
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _init():
        stream_ref[:] = x_ref[:]

    stage_kw = dict(num_heads=num_heads, head_dim=head_dim, scale=scale,
                    eps=eps, f32_prec=f32_prec, fold_div=bool(fold_div),
                    bf16_exp=bf16_exp)
    unroll = os.environ.get("D3DP_RES_UNROLL", "") == "1"

    # ---- spatial block: rows are frames, sequences are the J joints ----
    def sp_chunk(i, carry):
        f0 = jnp.minimum(i * csf, F - csf) if not isinstance(i, int) \
            else min(i * csf, F - csf)
        xs = stream_ref[0, pl.ds(f0, csf)]  # (csf, J, C)
        x2, y2 = _stage_math(xs, s_wqkv[0], s_bqkv[0], s_wp[0], s_vec,
                             acc_s_ref, **stage_kw)
        out = _mlp_math(y2.reshape(csf * J, C), x2.reshape(csf * J, C),
                        s_w1[0], s_b1[0], s_w2[0], s_vec, shared_ref, 0,
                        eps=eps, f32_prec=f32_prec)
        stage_s_ref[pl.ds(f0, csf)] = out.reshape(csf, J, C)
        return carry

    if unroll or ncf == 1:
        # static starts: Mosaic schedules across chunk boundaries (compile
        # cost scales with the unroll factor — lab knob D3DP_RES_UNROLL)
        for ii in range(ncf):
            sp_chunk(ii, 0)
    else:
        jax.lax.fori_loop(0, ncf, sp_chunk, 0)

    @pl.when(d == 0)
    def _add_tpos():
        # temporal pos-embed rides between ste_0 and tte_0 (bf16 add, as in
        # the level-4 flow: models/mixste.py fuse_level>=3 branch)
        stage_s_ref[:] = stage_s_ref[:] + tpos_ref[:][:, None, :].astype(
            stage_s_ref.dtype)

    # ---- temporal block: transpose once, chunk over joints ----
    stream_t_ref[:] = jnp.swapaxes(stage_s_ref[:], 0, 1)  # (J, F, C)

    def tp_chunk(i, carry):
        j0 = jnp.minimum(i * cst, J - cst) if not isinstance(i, int) \
            else min(i * cst, J - cst)
        xt = stream_t_ref[pl.ds(j0, cst)]  # (cst, F, C)
        x2, y2 = _stage_math(xt, t_wqkv[0], t_bqkv[0], t_wp[0], t_vec,
                             acc_t_ref, **stage_kw)
        out = _mlp_math(y2.reshape(cst * F, C), x2.reshape(cst * F, C),
                        t_w1[0], t_b1[0], t_w2[0], t_vec, shared_ref, 2,
                        eps=eps, f32_prec=f32_prec)
        stage_t_ref[pl.ds(j0, cst)] = out.reshape(cst, F, C)
        return carry

    if unroll or nct == 1:
        for ii in range(nct):
            tp_chunk(ii, 0)
    else:
        jax.lax.fori_loop(0, nct, tp_chunk, 0)

    new4 = jnp.swapaxes(stage_t_ref[:], 0, 1)[None]  # (1, F, J, C)
    stream_ref[:] = new4

    @pl.when(d == depth - 1)
    def _emit():
        o_ref[:] = new4


def _chunking(F, J):
    """Chunk geometry matching the r2-tuned per-kernel tiles: spatial
    chunks target ~1.5k tokens (csf*J), temporal chunks ~9 sequences.
    Starts clamp to the end, so chunks overlap rather than shrink (the
    recompute is idempotent); ceil-sizing keeps the overlap < one chunk."""
    sp_tokens = int(os.environ.get("D3DP_RES_SP_TOKENS", "") or 1536)
    tp_seqs = int(os.environ.get("D3DP_RES_TP_SEQS", "") or 9)
    ncf = max(1, -(-(F * J) // sp_tokens))
    csf = -(-F // ncf)
    cst = min(tp_seqs, J)
    nct = -(-J // cst)
    return csf, ncf, cst, nct


@partial(jax.jit, static_argnames=("num_heads", "scale", "eps", "interpret"))
def resident_block_stack(x, tpos, spatial, temporal, shared, num_heads,
                         scale, eps, interpret=None):
    """x: (B, F, J, C) embedded stream (compute dtype); tpos: (F, C)
    temporal pos-embed (param dtype); spatial/temporal: per-kind tuples
    (wqkv (D,C,3C), bqkv (D,1,3C), wp (D,C,C), w1 (D,C,H), b1 (D,1,H),
    w2 (D,H,C), vec (D,6,C)) with weights in the compute dtype and
    vec rows [bp, ln1s, ln1b, ln2s, ln2b, b2] in the param dtype;
    shared: (4, C) rows [spatial_norm s, b, temporal_norm s, b].
    Returns the post-trunk (B, F, J, C) stream (pre head-norm)."""
    B, F, J, C = x.shape
    D = spatial[0].shape[0]
    H = spatial[3].shape[2]
    d = C // num_heads
    if interpret is None:
        interpret = _interpret_default()
    csf, ncf, cst, nct = _chunking(F, J)

    f32_prec = x.dtype == jnp.float32
    fold_div = (not f32_prec) and os.environ.get(
        "D3DP_SOFTMAX_FOLD", "1") == "1"
    bf16_exp = (os.environ.get("D3DP_ATTN_VARIANT", "") == "bf16exp"
                and not f32_prec)

    mem = pl.ANY if interpret else pltpu.VMEM
    row_spec = pl.BlockSpec((1, F, J, C), lambda i, dd: (i, 0, 0, 0),
                            memory_space=mem)
    tpos_spec = pl.BlockSpec((F, C), lambda i, dd: (0, 0), memory_space=mem)
    shared_spec = pl.BlockSpec((4, C), lambda i, dd: (0, 0), memory_space=mem)

    def kind_specs():
        return [
            pl.BlockSpec((1, C, 3 * C), lambda i, dd: (dd, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, 1, 3 * C), lambda i, dd: (dd, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, C, C), lambda i, dd: (dd, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, C, H), lambda i, dd: (dd, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, 1, H), lambda i, dd: (dd, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, H, C), lambda i, dd: (dd, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, 6, C), lambda i, dd: (dd, 0, 0),
                         memory_space=mem),
        ]

    flops_blk = (2 * B * F * J * C * 3 * C          # qkv
                 + 2 * B * F * J * C * C            # proj
                 + 4 * B * F * J * C * H)           # mlp
    attn_flops = 2 * 2 * B * F * J * C * (J + F)    # qk+av both kinds
    return pl.pallas_call(
        partial(_resident_kernel, depth=D, num_heads=num_heads, head_dim=d,
                scale=scale, eps=eps, f32_prec=f32_prec, fold_div=fold_div,
                bf16_exp=bf16_exp, csf=csf, ncf=ncf, cst=cst, nct=nct,
                F=F, J=J, C=C),
        out_shape=jax.ShapeDtypeStruct((B, F, J, C), x.dtype),
        grid=(B, D),
        in_specs=[row_spec, tpos_spec] + kind_specs() + kind_specs()
        + [shared_spec],
        out_specs=row_spec,
        scratch_shapes=[
            pltpu.VMEM((1, F, J, C), x.dtype),    # stream (depth-resident)
            pltpu.VMEM((F, J, C), x.dtype),       # spatial block output
            pltpu.VMEM((J, F, C), x.dtype),       # transposed snapshot
            pltpu.VMEM((J, F, C), x.dtype),       # temporal block output
            pltpu.VMEM((csf, J, C), x.dtype),     # spatial head accumulator
            pltpu.VMEM((cst, F, C), x.dtype),     # temporal head accumulator
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * D * flops_blk + D * attn_flops,
            bytes_accessed=2 * B * F * J * C * x.dtype.itemsize,
            transcendentals=2 * D * B * F * J * (num_heads * (J + F) + H),
        ),
    )(x, tpos, *spatial, *temporal, shared)
