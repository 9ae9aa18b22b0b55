"""MixSTE2 spatio-temporal transformer denoiser, TPU-first flax implementation.

Capability parity with the reference (common/mixste.py:141-298): alternating
spatial (J tokens) and temporal (F tokens) pre-LN transformer blocks over a
(B, F, J, C) activation, conditioned on the diffusion timestep via a
sinusoidal MLP embedding added to every token.

TPU-first design points (vs the reference's torch module):
  * one rank-4 forward — the hypothesis dim is folded into the batch by the
    caller, so train and eval trace the same graph (the reference keeps two
    rank-specific code paths, mixste.py:213-245)
  * all attention/matmul compute in a configurable dtype (bf16 eval / fp32
    parity) with explicit precision — this JAX build defaults to
    low-precision matmuls otherwise
  * softmax always in fp32 for stability
  * statically-shaped einsum attention: at J=17/F=243 tokens the whole
    attention fits VMEM; XLA fuses qkv-projection + softmax + out-projection,
    an optional Pallas fused kernel can be swapped in via `attention_impl`

Parity notes (things that silently break checkpoint parity if changed):
  * GELU is the exact erf form (torch nn.GELU default), not tanh approx
  * LayerNorm eps = 1e-6 (mixste.py:163)
  * ONE shared spatial_norm / temporal_norm applied after every depth
    (mixste.py:203-204, :243, :257, :269, :273)
  * temporal pos-embed added once, before the first temporal block only
  * learned pos-embeds init to zeros (mixste.py:171-174)
  * DropPath rates linspace(0, drop_path_rate, depth), applied per
    flattened-batch row (so per frame for spatial blocks, per joint for
    temporal blocks), matching timm semantics
"""

import math
import os
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


@dataclass(frozen=True)
class MixSTEConfig:
    num_frames: int = 243
    num_joints: int = 17
    in_chans: int = 2
    embed_dim: int = 512
    depth: int = 8
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32  # compute dtype (bf16 for the fast path)
    param_dtype: Any = jnp.float32
    precision: Any = "highest"  # explicit: this JAX build defaults low
    attention_impl: str = "xla"  # "xla" | "pallas"
    # pallas-path fusion level (each step measured faster in-graph on v5e):
    #   0 = fused attention kernel only (r1 structure)
    #   2 = + [attention+proj+residual+LN2] and [MLP+residual+shared-LN]
    #       stage kernels
    #   3 = + transpose-free flow (relayout rides the MLP kernel's output)
    #   4 = + LN1/qkv folded into the attention-stage kernel (whole block
    #       is two Pallas kernels; activations make 6 HBM passes per block)
    # Ignored when attention_impl == "xla".
    fuse_level: int = 4


def sinusoidal_time_embedding(t, dim, dtype=jnp.float32):
    """Sinusoidal embeddings of diffusion timesteps. t: (B,) -> (B, dim).

    (reference: common/mixste.py:127-139)
    """
    half_dim = dim // 2
    freq = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -freq)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    return emb.astype(dtype)


class DropPath(nn.Module):
    """Stochastic depth: drop whole residual branches per batch row."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, p=keep, shape=shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class LNParams(nn.Module):
    """LayerNorm parameter holder: same tree as nn.LayerNorm ({scale, bias})
    but returns the raw vectors for fused Pallas kernels."""

    dim: int
    param_dtype: Any

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,),
                       self.param_dtype),
            self.param("bias", nn.initializers.zeros, (self.dim,),
                       self.param_dtype),
        )


class DenseParams(nn.Module):
    """Dense parameter holder: same tree and init as nn.Dense ({kernel,
    bias}) but returns the raw arrays for fused Pallas kernels."""

    in_features: int
    features: int
    param_dtype: Any

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features), self.param_dtype),
            self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype),
        )


def _ln_xla(x, scale, bias, eps, dtype):
    """LayerNorm from raw param vectors via plain jnp (XLA fuses this into
    neighbours; same math as nn.LayerNorm with fp32 statistics)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        dtype)


class MlpParams(nn.Module):
    """Parameter holder matching Mlp's tree (mlp/{fc1, fc2})."""

    dim: int
    hidden: int
    param_dtype: Any

    @nn.compact
    def __call__(self):
        w1, b1 = DenseParams(self.dim, self.hidden, self.param_dtype,
                             name="fc1")()
        w2, b2 = DenseParams(self.hidden, self.dim, self.param_dtype,
                             name="fc2")()
        return w1, b1, w2, b2


class AttnParams(nn.Module):
    """Parameter holder matching FusedAttentionStage/Attention's tree
    (attn/{qkv, proj}) — used by the depth-resident megakernel path, which
    consumes raw stacked weights instead of calling per-block modules."""

    dim: int
    param_dtype: Any

    @nn.compact
    def __call__(self):
        wq, bq = DenseParams(self.dim, 3 * self.dim, self.param_dtype,
                             name="qkv")()
        wp, bp = DenseParams(self.dim, self.dim, self.param_dtype,
                             name="proj")()
        return wq, bq, wp, bp


class BlockParams(nn.Module):
    """Declares one Block's full parameter set (identical tree/init to
    Block: norm1, norm2, attn/{qkv,proj}, mlp/{fc1,fc2}) and returns the
    raw arrays for the depth-resident kernel (ops/resident.py)."""

    dim: int
    hidden: int
    param_dtype: Any

    @nn.compact
    def __call__(self):
        s1, b1 = LNParams(self.dim, self.param_dtype, name="norm1")()
        s2, b2 = LNParams(self.dim, self.param_dtype, name="norm2")()
        wq, bq, wp, bp = AttnParams(self.dim, self.param_dtype,
                                    name="attn")()
        w1, bb1, w2, bb2 = MlpParams(self.dim, self.hidden,
                                     self.param_dtype, name="mlp")()
        return dict(wq=wq, bq=bq, wp=wp, bp=bp, ln1s=s1, ln1b=b1, ln2s=s2,
                    ln2b=b2, w1=w1, b1=bb1, w2=w2, b2=bb2)


class FusedAttentionStage(nn.Module):
    """The whole pre-LN attention stage via one Pallas kernel (LN1 + qkv +
    attention + out-proj + residual + LN2). Parameter-tree compatible with
    Attention (attn/{qkv, proj}); the caller owns the LN params."""

    dim: int
    num_heads: int
    qk_scale: Optional[float]
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x, ln1, ln2, dp=None):
        from d3dp_tpu.ops.attention import (attention_stage_dp_p,
                                            attention_stage_p)

        C = self.dim
        scale = self.qk_scale or (C // self.num_heads) ** -0.5
        wq, bq = DenseParams(C, 3 * C, self.param_dtype, name="qkv")()
        wp, bp = DenseParams(C, C, self.param_dtype, name="proj")()
        if dp is not None:
            return attention_stage_dp_p(
                x, wq.astype(self.dtype), bq, wp.astype(self.dtype), bp,
                ln1[0], ln1[1], ln2[0], ln2[1], dp, self.num_heads, scale,
                1e-6)
        return attention_stage_p(
            x, wq.astype(self.dtype), bq, wp.astype(self.dtype), bp,
            ln1[0], ln1[1], ln2[0], ln2[1], self.num_heads, scale, 1e-6)


class FusedAttention(nn.Module):
    """Attention via the fused Pallas block kernel (attention + out-proj +
    gated residual + next LayerNorm in one VMEM pass). Parameter-tree
    compatible with Attention (attn/{qkv, proj})."""

    dim: int
    num_heads: int
    qkv_bias: bool
    qk_scale: Optional[float]
    dtype: Any
    param_dtype: Any
    precision: Any

    @nn.compact
    def __call__(self, y1, res, ln_scale, ln_bias):
        from d3dp_tpu.ops.attention import attention_block_p

        C = self.dim
        scale = self.qk_scale or (C // self.num_heads) ** -0.5
        qkv = nn.Dense(
            3 * C,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            name="qkv",
        )(y1)
        w, b = DenseParams(C, C, self.param_dtype, name="proj")()
        return attention_block_p(
            qkv, res.astype(self.dtype), w.astype(self.dtype), b,
            ln_scale, ln_bias, self.num_heads, scale, 1e-6)


class Attention(nn.Module):
    """Multi-head softmax self-attention with fused qkv projection.

    (reference: common/mixste.py:46-82; `comb` q^T k mode intentionally
    dropped — dead in every reference configuration)
    """

    dim: int
    num_heads: int
    qkv_bias: bool
    qk_scale: Optional[float]
    attn_drop: float
    proj_drop: float
    dtype: Any
    param_dtype: Any
    precision: Any
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, deterministic: bool):
        B, N, C = x.shape
        h = self.num_heads
        dh = C // h
        scale = self.qk_scale or dh**-0.5

        qkv = nn.Dense(
            3 * C,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            name="qkv",
        )(x)

        if self.impl == "pallas":
            from d3dp_tpu.ops.attention import fused_attention_qkv_ad

            assert self.attn_drop == 0.0, (
                "pallas attention does not implement attention dropout")
            out = fused_attention_qkv_ad(qkv, h, scale).reshape(B, N, h, dh)
        else:
            qkv = qkv.reshape(B, N, 3, h, dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,N,h,dh)
            # logits/softmax in fp32 regardless of compute dtype
            attn = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, precision=self.precision
            ).astype(jnp.float32)
            attn = jax.nn.softmax(attn * scale, axis=-1).astype(self.dtype)
            if self.attn_drop > 0.0 and not deterministic:
                attn = nn.Dropout(rate=self.attn_drop, deterministic=False)(attn)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v, precision=self.precision)

        out = out.reshape(B, N, C)
        out = nn.Dense(
            C,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            name="proj",
        )(out)
        if self.proj_drop > 0.0:
            out = nn.Dropout(rate=self.proj_drop, deterministic=deterministic)(out)
        return out


class Mlp(nn.Module):
    """Two-layer MLP with exact-erf GELU. (reference: common/mixste.py:24-43)"""

    hidden: int
    out: int
    drop: float
    dtype: Any
    param_dtype: Any
    precision: Any

    @nn.compact
    def __call__(self, x, deterministic: bool):
        x = nn.Dense(
            self.hidden,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        if self.drop > 0.0:
            x = nn.Dropout(rate=self.drop, deterministic=deterministic)(x)
        x = nn.Dense(
            self.out,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            name="fc2",
        )(x)
        if self.drop > 0.0:
            x = nn.Dropout(rate=self.drop, deterministic=deterministic)(x)
        return x


class Block(nn.Module):
    """Pre-LN transformer block with stochastic depth.

    (reference: common/mixste.py:84-125)
    """

    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    attn_drop: float
    drop_path: float
    dtype: Any
    param_dtype: Any
    precision: Any
    attention_impl: str
    fuse_level: int = 2

    def _droppath_masks(self, n_rows):
        """Two independent per-row stochastic-depth scale vectors (one per
        residual branch, reference mixste.py:114-115 — the same DropPath
        module called twice draws fresh masks each call). Drawn HERE (not
        inside DropPath submodules) so the composed and fused paths consume
        identical masks given the same rng — which is what makes them
        exactly comparable in tests."""
        keep = 1.0 - self.drop_path
        r1, r2 = jax.random.split(self.make_rng("dropout"))
        m1 = jnp.where(jax.random.bernoulli(r1, keep, (n_rows,)),
                       1.0 / keep, 0.0).astype(jnp.float32)
        m2 = jnp.where(jax.random.bernoulli(r2, keep, (n_rows,)),
                       1.0 / keep, 0.0).astype(jnp.float32)
        return m1, m2

    @nn.compact
    def __call__(self, x, deterministic: bool, out_ln=None, transpose_b=None):
        """out_ln=(scale, bias): on the fused path the block also applies
        the caller's post-block shared LayerNorm (MixSTE2's spatial/temporal
        norm) inside the final fused add — the caller must then NOT re-apply
        it. transpose_b=B0 (true batch): the block additionally emits its
        output in the OTHER spatial/temporal layout, (B0*N, B//B0, C) — on
        the fused path the relayout rides the MLP kernel's output DMA."""
        dp_active = (not deterministic) and self.drop_path > 0.0
        dp = self._droppath_masks(x.shape[0]) if dp_active else None
        dp_fused_ok = self.fuse_level >= 4 and self.qkv_bias
        # The fused STAGE kernels are an EVAL/SAMPLING win only: their
        # custom-VJP backward (XLA recompute + per-stage Pallas calls)
        # measured 37% slower than autodiff through the composed path at
        # train shapes (74.2 vs 54.1 ms/step, r4c paired cells — the fused
        # forward wins 16.1 vs 18.6 ms but the backward loses 56.6 vs
        # 33.7; PERFORMANCE.md r4). Training therefore defaults to the
        # composed path (which still runs the Pallas attention CORE — the
        # qualified bf16 fast path); D3DP_TRAIN_FUSED=1 opts the training
        # forward back onto the stage kernels for lab measurement.
        train_fused = os.environ.get("D3DP_TRAIN_FUSED", "0") == "1"
        if self.attention_impl == "pallas" and self.drop == 0.0 and \
                self.attn_drop == 0.0 and out_ln is not None and \
                (deterministic or train_fused) and \
                (not dp_active or dp_fused_ok):
            # active DropPath rides the fuse>=4 kernels as per-row branch
            # scales (ops/attention.py attention_stage_dp_p, ops/mlp.py
            # mlp_block[_t]_dp_p)
            return self._fused(x, deterministic, out_ln, transpose_b, dp=dp)
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        attn_out = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            impl=self.attention_impl,
            name="attn",
        )(ln("norm1")(x), deterministic)
        if dp is not None:
            attn_out = (attn_out * dp[0][:, None, None]).astype(attn_out.dtype)
        x = x + attn_out
        mlp_out = Mlp(
            hidden=int(self.dim * self.mlp_ratio),
            out=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            name="mlp",
        )(ln("norm2")(x), deterministic)
        if dp is not None:
            mlp_out = (mlp_out * dp[1][:, None, None]).astype(mlp_out.dtype)
        x = x + mlp_out
        if out_ln is not None:
            # caller delegated its shared post-block norm (fused-path
            # contract); apply it with plain XLA here
            x = _ln_xla(x, out_ln[0], out_ln[1], 1e-6, self.dtype)
        if transpose_b is not None:
            B, N, C = x.shape
            B0 = transpose_b
            x = x.reshape(B0, B // B0, N, C).transpose(0, 2, 1, 3)
            x = x.reshape(B0 * N, B // B0, C)
        return x

    def _fused(self, x, deterministic, out_ln, transpose_b=None, dp=None):
        """Pallas fused-block path. Fusion wins only where the kernel scope
        exceeds what XLA can fuse itself (measured in-graph on v5e —
        standalone LN/add kernels and the spatial attention+proj fusion all
        LOSE by breaking XLA's own producer/consumer fusion):

          level >= 1: [fc1 + exact GELU + fc2 + residual + shared-LN] in one
                      kernel (the MLP half of the block never leaves VMEM)
          level >= 2: [attention + out-proj + residual + LN2] kernel too,
                      on temporal stages (N >= 128) where it measures ahead

        LN1 and the qkv projection stay XLA, which fuses them into the
        surrounding matmuls. Engaged when dropout/DropPath are inactive
        (always at eval; active DropPath routes through the composed path)."""
        B, N, C = x.shape
        x = x.astype(self.dtype)

        if self.fuse_level >= 4 and self.qkv_bias:
            s1, b1 = LNParams(C, self.param_dtype, name="norm1")()
            s2, b2 = LNParams(C, self.param_dtype, name="norm2")()
            x2, y2 = FusedAttentionStage(
                dim=C,
                num_heads=self.num_heads,
                qk_scale=self.qk_scale,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="attn",
            )(x, (s1, b1), (s2, b2), dp=None if dp is None else dp[0])
            return self._fused_mlp(x2, y2, out_ln, transpose_b, B, N, C,
                                   dp=None if dp is None else dp[1])
        assert dp is None, "DropPath on the fused path needs fuse_level >= 4"
        y1 = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm1",
        )(x)
        if self.fuse_level >= 2:
            s2, b2 = LNParams(C, self.param_dtype, name="norm2")()
            x2, y2 = FusedAttention(
                dim=C,
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                precision=self.precision,
                name="attn",
            )(y1, x, s2, b2)
        else:
            attn_out = Attention(
                dim=C,
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                attn_drop=0.0,
                proj_drop=0.0,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                precision=self.precision,
                impl="pallas",
                name="attn",
            )(y1, deterministic)
            x2 = x + attn_out
            s2, b2 = LNParams(C, self.param_dtype, name="norm2")()
            y2 = _ln_xla(x2, s2, b2, 1e-6, self.dtype)

        return self._fused_mlp(x2, y2, out_ln, transpose_b, B, N, C)

    def _fused_mlp(self, x2, y2, out_ln, transpose_b, B, N, C, dp=None):
        out_s, out_b = out_ln
        from d3dp_tpu.ops.mlp import (mlp_block_dp_p, mlp_block_p,
                                      mlp_block_t_dp_p, mlp_block_t_p)

        w1, b1, w2, bb2 = MlpParams(C, int(C * self.mlp_ratio),
                                    self.param_dtype, name="mlp")()
        w1, w2 = w1.astype(self.dtype), w2.astype(self.dtype)
        if transpose_b is not None:
            B0 = transpose_b
            D1 = B // B0
            if dp is not None:
                out = mlp_block_t_dp_p(
                    y2.reshape(B0, D1, N, C), x2.reshape(B0, D1, N, C),
                    w1, b1, w2, bb2, out_s, out_b, dp.reshape(B0, D1), 1e-6)
            else:
                out = mlp_block_t_p(
                    y2.reshape(B0, D1, N, C), x2.reshape(B0, D1, N, C),
                    w1, b1, w2, bb2, out_s, out_b, 1e-6)
            return out.reshape(B0 * N, D1, C)
        if dp is not None:
            dp_rows = jnp.broadcast_to(dp[:, None], (B, N)).reshape(B * N)
            out = mlp_block_dp_p(
                y2.reshape(B * N, C), x2.reshape(B * N, C),
                w1, b1, w2, bb2, out_s, out_b, dp_rows, 1e-6)
        else:
            out = mlp_block_p(
                y2.reshape(B * N, C), x2.reshape(B * N, C),
                w1, b1, w2, bb2, out_s, out_b, 1e-6)
        return out.reshape(B, N, C)


class MixSTE2(nn.Module):
    """Alternating spatial/temporal transformer denoiser.

    __call__(x2d, x3d, t, deterministic) with
      x2d: (B, F, J, in_chans) conditioning 2D keypoints
      x3d: (B, F, J, 3) noisy 3D pose
      t:   (B,) int/float diffusion timesteps
    returns (B, F, J, 3) predicted clean pose.

    Hypotheses/TTA are folded into B by the diffusion wrapper.
    """

    cfg: MixSTEConfig

    @nn.compact
    def __call__(self, x2d, x3d, t, deterministic: bool = True,
                 reuse_tap: Optional[int] = None, deep_delta=None):
        """reuse_tap / deep_delta implement DDIM feature reuse
        (FRDiff-style, arXiv:2312.03517; see diffusion/d3dp.py):

          * reuse_tap=d, deep_delta=None ("full" step): run every block and
            ADDITIONALLY return the deep residual-stream delta — the
            (B,F,J,C) activation after the last block pair minus the
            activation after pair d-1 — so returns (out, delta).
          * reuse_tap=d, deep_delta=<delta> ("reuse" step): run only block
            pairs 0..d-1 fresh, approximate the final stream as
            tap_stream + deep_delta (the deep blocks' cached contribution),
            and run the head; returns out.

        Tap points sit at block-pair boundaries in the canonical (B,F,J,C)
        layout, after the shared spatial/temporal norms — identical across
        the XLA and fused-Pallas paths. Eval-only (deterministic)."""
        cfg = self.cfg
        B, F, J, _ = x3d.shape
        C = cfg.embed_dim
        if reuse_tap is not None:
            assert 1 <= reuse_tap <= cfg.depth, reuse_tap
            assert deterministic, "feature reuse is an eval-only mode"
        collect_delta = reuse_tap is not None and deep_delta is None
        resume = deep_delta is not None

        x = jnp.concatenate([x2d, x3d], axis=-1).astype(cfg.dtype)
        x = nn.Dense(
            C,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            precision=cfg.precision,
            name="joint_embed",
        )(x)

        spatial_pos = self.param(
            "spatial_pos_embed",
            nn.initializers.zeros,
            (1, cfg.num_joints, C),
            cfg.param_dtype,
        )
        temporal_pos = self.param(
            "temporal_pos_embed",
            nn.initializers.zeros,
            (1, cfg.num_frames, C),
            cfg.param_dtype,
        )

        # timestep embedding MLP: sinusoidal -> 2C -> gelu -> C
        temb = sinusoidal_time_embedding(t, C, dtype=cfg.dtype)
        temb = nn.Dense(
            2 * C,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            precision=cfg.precision,
            name="time_mlp_fc1",
        )(temb)
        temb = nn.gelu(temb, approximate=False)
        temb = nn.Dense(
            C,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            precision=cfg.precision,
            name="time_mlp_fc2",
        )(temb)

        x = x + spatial_pos[None].astype(cfg.dtype)  # broadcast over (B,F)
        x = x + temb[:, None, None, :]

        if cfg.drop_rate > 0.0:
            x = nn.Dropout(rate=cfg.drop_rate, deterministic=deterministic)(x)

        dpr = np.linspace(0, cfg.drop_path_rate, cfg.depth)

        def make_block(kind, i):
            return Block(
                dim=C,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale,
                drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate,
                drop_path=float(dpr[i]),
                dtype=cfg.dtype,
                param_dtype=cfg.param_dtype,
                precision=cfg.precision,
                attention_impl=cfg.attention_impl,
                fuse_level=cfg.fuse_level,
                name=f"{kind}_{i}",
            )

        # fused pallas path: post-block shared norms are applied INSIDE the
        # blocks' final fused add+LN kernel, so declare raw params here
        # (same tree as the nn.LayerNorm modules) and hand them down
        fused = cfg.attention_impl == "pallas" and cfg.drop_rate == 0.0 \
            and cfg.attn_drop_rate == 0.0 and cfg.fuse_level >= 1
        if fused:
            spatial_ln = LNParams(C, cfg.param_dtype, name="spatial_norm")()
            temporal_ln = LNParams(C, cfg.param_dtype, name="temporal_norm")()
            spatial_norm = temporal_norm = lambda y: y
        else:
            spatial_ln = temporal_ln = None
            spatial_norm = nn.LayerNorm(
                epsilon=1e-6, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                name="spatial_norm",
            )
            temporal_norm = nn.LayerNorm(
                epsilon=1e-6, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                name="temporal_norm",
            )

        def to_spatial(x4):  # (B,F,J,C) -> (B*F, J, C)
            return x4.reshape(B * F, J, C)

        def from_spatial(xs):
            return xs.reshape(B, F, J, C)

        def to_temporal(x4):  # (B,F,J,C) -> (B*J, F, C)
            return x4.transpose(0, 2, 1, 3).reshape(B * J, F, C)

        def from_temporal(xt):
            return xt.reshape(B, J, F, C).transpose(0, 2, 1, 3)

        resident = (fused and cfg.fuse_level >= 5 and deterministic
                    and reuse_tap is None)
        if resident:
            # level 5: the whole 2*depth-block trunk is ONE Pallas call with
            # the residual stream resident in VMEM across depths
            # (ops/resident.py). Params are declared through mirror holders
            # with the exact tree of the per-block modules, then stacked
            # along depth for the kernel's blocked weight streams.
            from d3dp_tpu.ops.resident import resident_block_stack

            hidden = int(C * cfg.mlp_ratio)
            sp = [BlockParams(C, hidden, cfg.param_dtype, name=f"ste_{i}")()
                  for i in range(cfg.depth)]
            tp = [BlockParams(C, hidden, cfg.param_dtype, name=f"tte_{i}")()
                  for i in range(cfg.depth)]

            def stack_kind(ps):
                return (
                    jnp.stack([p["wq"] for p in ps]).astype(cfg.dtype),
                    jnp.stack([p["bq"] for p in ps])[:, None, :],
                    jnp.stack([p["wp"] for p in ps]).astype(cfg.dtype),
                    jnp.stack([p["w1"] for p in ps]).astype(cfg.dtype),
                    jnp.stack([p["b1"] for p in ps])[:, None, :],
                    jnp.stack([p["w2"] for p in ps]).astype(cfg.dtype),
                    jnp.stack([jnp.stack([p["bp"], p["ln1s"], p["ln1b"],
                                          p["ln2s"], p["ln2b"], p["b2"]])
                               for p in ps]),
                )

            shared = jnp.stack([spatial_ln[0], spatial_ln[1],
                                temporal_ln[0], temporal_ln[1]])
            scale = cfg.qk_scale or (C // cfg.num_heads) ** -0.5
            x = resident_block_stack(
                x, temporal_pos[0], stack_kind(sp), stack_kind(tp), shared,
                cfg.num_heads, scale, 1e-6)
        elif fused and cfg.fuse_level >= 3:
            # transpose-free flow: every block emits its output already in
            # the next stage\'s layout (the relayout rides the fused MLP
            # kernel\'s output DMA) — no standalone spatial<->temporal
            # transposes anywhere in the network
            h = make_block("ste", 0)(to_spatial(x), deterministic,
                                     out_ln=spatial_ln, transpose_b=B)
            h = h + temporal_pos.astype(cfg.dtype)  # (B*J, F, C) + (1, F, C)
            h = make_block("tte", 0)(h, deterministic,
                                     out_ln=temporal_ln, transpose_b=B)
            tap_stream = from_spatial(h) if reuse_tap == 1 else None
            for i in range(1, reuse_tap if resume else cfg.depth):
                h = make_block("ste", i)(h, deterministic,
                                         out_ln=spatial_ln, transpose_b=B)
                h = make_block("tte", i)(h, deterministic,
                                         out_ln=temporal_ln, transpose_b=B)
                if reuse_tap == i + 1:
                    tap_stream = from_spatial(h)
            x = (tap_stream + deep_delta.astype(cfg.dtype)) if resume \
                else from_spatial(h)
        else:
            # depth 0: spatial block (+shared norm), then temporal pos-embed
            # + temporal block (+shared norm)   (mixste.py:213-258)
            xs = make_block("ste", 0)(to_spatial(x), deterministic,
                                      out_ln=spatial_ln)
            x = from_spatial(spatial_norm(xs))

            xt = to_temporal(x) + temporal_pos.astype(cfg.dtype)
            if cfg.drop_rate > 0.0:
                xt = nn.Dropout(rate=cfg.drop_rate,
                                deterministic=deterministic)(xt)
            xt = make_block("tte", 0)(xt, deterministic, out_ln=temporal_ln)
            x = from_temporal(temporal_norm(xt))
            tap_stream = x if reuse_tap == 1 else None

            # depths 1..depth-1 alternate spatial/temporal (mixste.py:260-276)
            for i in range(1, reuse_tap if resume else cfg.depth):
                xs = make_block("ste", i)(to_spatial(x), deterministic,
                                          out_ln=spatial_ln)
                x = from_spatial(spatial_norm(xs))
                xt = make_block("tte", i)(to_temporal(x), deterministic,
                                          out_ln=temporal_ln)
                x = from_temporal(temporal_norm(xt))
                if reuse_tap == i + 1:
                    tap_stream = x
            if resume:
                x = tap_stream + deep_delta.astype(cfg.dtype)

        if collect_delta:
            deep_delta_out = x - tap_stream

        # the reference's head LN uses torch's default eps (1e-5), unlike the
        # 1e-6 block norms (mixste.py:207-210)
        x = nn.LayerNorm(
            epsilon=1e-5,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="head_norm",
        )(x)
        x = nn.Dense(
            3,
            dtype=jnp.float32,  # regression head always fp32
            param_dtype=cfg.param_dtype,
            precision=cfg.precision,
            name="head",
        )(x)
        if collect_delta:
            return x, deep_delta_out
        return x
