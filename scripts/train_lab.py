"""Training-step decomposition + batch-scaling lab (real chip).

The bench's secondary train metric runs the reference batch (4 chunks x
243 frames = 4 rows) — far less row parallelism than the eval forward's
40 flip-fused rows. This lab answers two questions with one run:

  1. Where do the ~51 ms/step go? (loss fwd only vs value_and_grad vs
     the full step with AdamW — the deltas are bwd and optimizer cost.)
  2. Does training throughput scale with batch? frames/s at B=4 is a
     utilization statement about that config, not a chip ceiling.

Matches the bench train config: bf16 compute + custom-VJP Pallas
attention, fp32 master weights, AdamW(6e-5, wd=0.1), root-zeroed x3d
(what `make_train_step` builds — see d3dp_tpu/train/state.py:61).

Run (pty-wrapped survives >600 s):
  nohup script -qec "python scripts/train_lab.py" /dev/null > /tmp/train_lab.log 2>&1 &
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from d3dp_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from d3dp_tpu.diffusion import D3DP, D3DPConfig
from d3dp_tpu.models import MixSTEConfig
from d3dp_tpu.train.state import (TrainState, make_optimizer,
                                  make_train_step, weighted_mpjpe)

F, J = 243, 17


def timeit(fn, n=10):
    """Median-free mean over n calls; fn must return a scalar-able array
    whose float() forces completion (block_until_ready is unreliable
    through the tunnel — CLAUDE.md)."""
    _ = float(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n - 1):
        fn()
    _ = float(fn())
    return (time.perf_counter() - t0) / n * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dpr", type=float, default=0.1,
                    help="drop_path_rate: 0.1 = reference training config; "
                         "0.0 engages the fused stage kernels (diagnostic "
                         "for the DropPath fused-path gap)")
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16, 32])
    opts = ap.parse_args()
    d3dp = D3DP(
        D3DPConfig(
            model=MixSTEConfig(num_frames=F, embed_dim=512, depth=8,
                               drop_path_rate=opts.dpr, dtype=jnp.bfloat16,
                               attention_impl="pallas"),
            num_proposals=1, sampling_timesteps=1,
        )
    )
    tx = make_optimizer(6e-5)
    params0 = d3dp.init_params(jax.random.PRNGKey(0))
    state0 = TrainState.create(params0, tx)
    step = make_train_step(d3dp, tx, donate=False)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params0))

    def loss_value(params, key, x2d, x3d, w):
        x3d = x3d.at[:, :, 0].set(0.0)
        pred = d3dp.train_forward({"params": params}, key, x2d, x3d, train=True)
        return weighted_mpjpe(pred, x3d, w)

    loss_fn = jax.jit(loss_value)

    def _value_and_gradsum(p, k, a, b, w):
        # reduce the grads into the returned scalar so XLA cannot
        # dead-code-eliminate the backward pass
        v, g = jax.value_and_grad(loss_value)(p, k, a, b, w)
        gs = sum(jnp.sum(x.astype(jnp.float32))
                 for x in jax.tree_util.tree_leaves(g))
        return v + 1e-30 * gs  # numerically negligible, not DCE-able

    grad_fn = jax.jit(_value_and_gradsum)

    rng = np.random.RandomState(0)
    results = []
    for B in opts.batches:
        x2d = jnp.asarray(rng.randn(B, F, J, 2) * 0.3, jnp.float32)
        x3d = jnp.asarray(rng.randn(B, F, J, 3) * 0.3, jnp.float32)
        w = jnp.ones((B,), jnp.float32)
        key = jax.random.PRNGKey(1)
        params = state0.params["params"]

        box = {"s": state0}

        def run_step():
            box["s"], loss = step(box["s"], key, x2d, x3d, w)
            return loss

        try:
            ms_step = timeit(run_step)
        except Exception as e:  # noqa: BLE001 — record OOM/compile failures per cell
            # keep the error IN the summary line: campaign runners read only
            # the last stdout line, so a bare cells:[] hid real failures
            # (r4b ctlB's Mosaic block-shape error looked like a no-op cell)
            results.append({"B": B, "error": str(e)[:200]})
            print(json.dumps(results[-1]), flush=True)
            break
        ms_loss = timeit(lambda: loss_fn(params, key, x2d, x3d, w))
        ms_grad = timeit(lambda: grad_fn(params, key, x2d, x3d, w))

        out = {"B": B, "ms_full_step": round(ms_step, 1),
               "ms_loss_fwd": round(ms_loss, 1),
               "ms_value_and_grad": round(ms_grad, 1),
               "frames_per_sec": round(B * F / (ms_step / 1000), 1),
               # fwd 2P + bwd ~4P per token position = 6P (bench.py's
               # train-rate convention) — the batch-vs-MFU curve column
               "model_tflops_per_sec": round(
                   6 * n_params * B * F * J / (ms_step / 1000) / 1e12, 1)}
        results.append(out)
        print(json.dumps(out), flush=True)

    print(json.dumps({"device": str(jax.devices()[0]), "dpr": opts.dpr,
                      "cells": results}))


if __name__ == "__main__":
    main()
