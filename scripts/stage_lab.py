"""Time ONE attention-stage kernel in isolation on the real chip.

The r2 profile puts the 16 attention-stage kernels at 81 of 147 ms/fwd,
~2.6x above roofline; this lab measures candidate variants without paying a
full-model compile. One process = one (stage, variant, tile) cell — the
variant switch (D3DP_ATTN_VARIANT) is trace-time state.

Usage (each row of the sweep, fresh process):
  python scripts/stage_lab.py --stage temporal [--tb 8] [--iters 30]
  D3DP_ATTN_VARIANT=bf16exp python scripts/stage_lab.py --stage temporal
  D3DP_ATTN_VARIANT=batched python scripts/stage_lab.py --stage temporal --tb 2

Shapes are the bench-config eval shapes (B=4 windows, H=5, flip TTA ->
40 folded rows): temporal (40*17, 243, 512); spatial (40*243, 17, 512).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["temporal", "spatial",
                                       "mlp_temporal", "mlp_spatial"],
                   default="temporal")
    p.add_argument("--tb", type=int, default=0, help="batch tile override")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--rows", type=int, default=0,
                   help="override row count (default: bench eval shape)")
    opts = p.parse_args()

    from d3dp_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from d3dp_tpu.ops.attention import _attention_stage_fwd

    C, h = 512, 8
    dt = jnp.bfloat16 if opts.dtype == "bfloat16" else jnp.float32

    if opts.stage.startswith("mlp_"):
        _run_mlp(opts, jax, jnp, C, dt)
        return
    if opts.stage == "temporal":
        B, N = opts.rows or 40 * 17, 243
    else:
        B, N = opts.rows or 40 * 243, 17

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, dt)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.04, dt)
    bqkv = jnp.asarray(rng.randn(3 * C) * 0.01, dt)
    wp = jnp.asarray(rng.randn(C, C) * 0.04, dt)
    bp = jnp.asarray(rng.randn(C) * 0.01, dt)
    ones, zeros = jnp.ones((C,), dt), jnp.zeros((C,), dt)

    tb = opts.tb or None
    fn = lambda xx: _attention_stage_fwd(
        xx, wqkv, bqkv, wp, bp, ones, zeros, ones, zeros, h, 0.125, 1e-6,
        tb=tb)

    t0 = time.perf_counter()
    x2, y2 = fn(x)
    _ = float(jnp.sum(x2)) + float(jnp.sum(y2))  # compile + sync
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _i in range(opts.iters):
        x2, y2 = fn(x)
    _ = float(jnp.sum(x2))  # sync (block_until_ready unreliable via tunnel)
    dt_ms = (time.perf_counter() - t0) / opts.iters * 1e3

    from d3dp_tpu.ops.attention import _stage_variant

    print(json.dumps({
        "stage": opts.stage, "rows": B, "N": N,
        # resolved per-stage (r3: temporal defaults to `batched` with no
        # env set) so the lab records what actually ran
        "variant": _stage_variant(N) or "loop(default)",
        "tb": opts.tb or "auto", "dtype": opts.dtype,
        "ms_per_call": round(dt_ms, 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


def _run_mlp(opts, jax, jnp, C, dt):
    """Time ONE transposing fused-MLP kernel (d3dp_tpu/ops/mlp.py
    _mlp_block_t_fwd) at the bench eval shapes: after the temporal stage
    the MLP sees (40, 17, 243, C); after the spatial stage (40, 243, 17, C)
    (models/mixste.py _fused_mlp). Variant switch: D3DP_MLP_VARIANT
    (bf16gelu = A&S erf poly in bf16; nogelu = diagnostic identity bound)."""
    import json
    import time

    from d3dp_tpu.ops.mlp import _mlp_block_t_fwd

    if opts.stage == "mlp_temporal":
        B0, D1, D2 = opts.rows or 40, 17, 243
    else:
        B0, D1, D2 = opts.rows or 40, 243, 17
    H = 2 * C

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B0, D1, D2, C) * 0.5, dt)
    res = jnp.asarray(rng.randn(B0, D1, D2, C) * 0.5, dt)
    w1 = jnp.asarray(rng.randn(C, H) * 0.04, dt)
    b1 = jnp.asarray(rng.randn(H) * 0.01, dt)
    w2 = jnp.asarray(rng.randn(H, C) * 0.04, dt)
    b2 = jnp.asarray(rng.randn(C) * 0.01, dt)
    ones, zeros = jnp.ones((C,), dt), jnp.zeros((C,), dt)

    tile = opts.tb or None
    fn = lambda xx: _mlp_block_t_fwd(xx, res, w1, b1, w2, b2, ones, zeros,
                                     1e-6, tile=tile)

    t0 = time.perf_counter()
    out = fn(x)
    _ = float(jnp.sum(out))  # compile + sync
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _i in range(opts.iters):
        out = fn(x)
    _ = float(jnp.sum(out))
    dt_ms = (time.perf_counter() - t0) / opts.iters * 1e3

    print(json.dumps({
        "stage": opts.stage, "shape": [B0, D1, D2, C],
        "variant": os.environ.get("D3DP_MLP_VARIANT", "") or "default",
        "tile": opts.tb or "auto", "dtype": opts.dtype,
        "ms_per_call": round(dt_ms, 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
