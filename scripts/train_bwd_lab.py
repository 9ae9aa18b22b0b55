"""Per-stage backward profile of the custom-VJP Pallas kernels (real chip).

VERDICT r3 weak-#3: the train step's ~30% MFU (vs the sampler's 47%) was
explained only by batch-flat frames/s; the custom-VJP backward had no
committed numbers. This lab times each fused stage kernel fwd-only vs
value_and_grad at the TRAIN shapes (B=4 chunks, no flip fold):

  temporal attention stage: (4*17,  243, 512)
  spatial  attention stage: (4*243,  17, 512)
  MLP block (token-flat):   (4*17*243,    512)

A healthy custom VJP lands near the textbook bwd:fwd ~= 2 (two extra
GEMMs per forward GEMM + activation recompute); a much larger ratio
means the backward composition is the train-step bottleneck.

Run:  nohup script -qec "python scripts/train_bwd_lab.py" /dev/null > /tmp/train_bwd_lab.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    from d3dp_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from d3dp_tpu.ops.attention import attention_stage_p
    from d3dp_tpu.ops.mlp import mlp_block_p

    C, h = 512, 8
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    rows_b = 4  # train batch: 4 chunks, no flip fold

    def timeit(fn, n=20):
        out = fn()
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        t0 = time.perf_counter()
        for _i in range(n - 1):
            fn()
        out = fn()  # n timed calls total; sync via float (CLAUDE.md)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        return (time.perf_counter() - t0) / n * 1000

    results = []
    for stage, B, N in (("attn_temporal", rows_b * 17, 243),
                        ("attn_spatial", rows_b * 243, 17)):
        x = jnp.asarray(rng.randn(B, N, C) * 0.5, dt)
        wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.04, dt)
        bqkv = jnp.asarray(rng.randn(3 * C) * 0.01, dt)
        wp = jnp.asarray(rng.randn(C, C) * 0.04, dt)
        bp = jnp.asarray(rng.randn(C) * 0.01, dt)
        ones, zeros = jnp.ones((C,), dt), jnp.zeros((C,), dt)

        def loss(xx, w0, w1, w2, w3):
            x2, y2 = attention_stage_p(xx, w0, w1, w2, w3, ones, zeros,
                                       ones, zeros, h, 0.125, 1e-6)
            return (jnp.sum(x2.astype(jnp.float32))
                    + jnp.sum(y2.astype(jnp.float32)))

        jfwd = jax.jit(lambda xx: attention_stage_p(
            xx, wqkv, bqkv, wp, bp, ones, zeros, ones, zeros, h, 0.125,
            1e-6))
        jgrad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
        ms_f = timeit(lambda: jfwd(x))
        ms_g = timeit(lambda: jgrad(x, wqkv, bqkv, wp, bp)[0])
        row = {"stage": stage, "shape": [B, N, C], "ms_fwd": round(ms_f, 2),
               "ms_value_and_grad": round(ms_g, 2),
               "bwd_to_fwd": round((ms_g - ms_f) / ms_f, 2)}
        results.append(row)
        print(json.dumps(row), flush=True)

    R = rows_b * 17 * 243  # all token positions of the train batch
    x = jnp.asarray(rng.randn(R, C) * 0.5, dt)
    res = jnp.asarray(rng.randn(R, C) * 0.5, dt)
    w1 = jnp.asarray(rng.randn(C, 2 * C) * 0.04, dt)
    b1 = jnp.asarray(rng.randn(2 * C) * 0.01, dt)
    w2 = jnp.asarray(rng.randn(2 * C, C) * 0.04, dt)
    b2 = jnp.asarray(rng.randn(C) * 0.01, dt)
    ones, zeros = jnp.ones((C,), dt), jnp.zeros((C,), dt)

    def loss_mlp(xx, rr, a1, c1, a2, c2):
        y = mlp_block_p(xx, rr, a1, c1, a2, c2, ones, zeros, 1e-6)
        return jnp.sum(y.astype(jnp.float32))

    jfwd = jax.jit(lambda xx: mlp_block_p(
        xx, res, w1, b1, w2, b2, ones, zeros, 1e-6))
    jgrad = jax.jit(jax.value_and_grad(loss_mlp, argnums=(0, 1, 2, 3, 4, 5)))
    ms_f = timeit(lambda: jfwd(x))
    ms_g = timeit(lambda: jgrad(x, res, w1, b1, w2, b2)[0])
    row = {"stage": "mlp_block", "shape": [R, C], "ms_fwd": round(ms_f, 2),
           "ms_value_and_grad": round(ms_g, 2),
           "bwd_to_fwd": round((ms_g - ms_f) / ms_f, 2)}
    results.append(row)
    print(json.dumps(row), flush=True)

    print(json.dumps({"device": str(jax.devices()[0]), "cells": results}))


if __name__ == "__main__":
    main()
