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

    @nn.compact
    def __call__(self, x, deterministic: bool):
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
        x = x + DropPath(self.drop_path, name="drop_path1")(attn_out, deterministic)
        mlp_out = Mlp(
            hidden=int(self.dim * self.mlp_ratio),
            out=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            name="mlp",
        )(ln("norm2")(x), deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(mlp_out, deterministic)
        return x


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
    def __call__(self, x2d, x3d, t, deterministic: bool = True):
        cfg = self.cfg
        B, F, J, _ = x3d.shape
        C = cfg.embed_dim

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
                name=f"{kind}_{i}",
            )

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

        # depth 0: spatial block (+shared norm), then temporal pos-embed +
        # temporal block (+shared norm)   (mixste.py:213-258)
        xs = make_block("ste", 0)(to_spatial(x), deterministic)
        x = from_spatial(spatial_norm(xs))

        xt = to_temporal(x) + temporal_pos.astype(cfg.dtype)
        if cfg.drop_rate > 0.0:
            xt = nn.Dropout(rate=cfg.drop_rate, deterministic=deterministic)(xt)
        xt = make_block("tte", 0)(xt, deterministic)
        x = from_temporal(temporal_norm(xt))

        # depths 1..depth-1 alternate spatial/temporal (mixste.py:260-276)
        for i in range(1, cfg.depth):
            xs = make_block("ste", i)(to_spatial(x), deterministic)
            x = from_spatial(spatial_norm(xs))
            xt = make_block("tte", i)(to_temporal(x), deterministic)
            x = from_temporal(temporal_norm(xt))

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
        return x
