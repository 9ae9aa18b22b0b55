"""Multi-chip sampling-throughput benchmark — ready to run on a real pod.

This environment exposes ONE tunnelled TPU chip, so the committed scaling
evidence is (a) the 8-device virtual-CPU weak-scaling run (`python bench.py
--dp 8`) and (b) this script, which on real hardware shards the flagship
DDIM sampler over all local devices and reports hyp*frames/s per chip and
aggregate. The sampler has no cross-device collectives on its forward path
(windows x hypotheses ride the dp batch axis), so scaling should be linear
until the host feed saturates; the host side is covered by the C++ chunk
assembler + background prefetcher (see scripts/bench_hostfeed.py).

Usage (single host of a pod slice; run under your pod launcher for
multi-host, JAX initializes the global mesh from the slice topology):

    python scripts/bench_pod.py [--dp N] [--tp 1] [--iters 10]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

B_PER_CHIP, H, K, F, J = 4, 5, 5, 243, 17


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dp", type=int, default=0, help="0 = all devices")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--iters", type=int, default=10)
    opts = p.parse_args()

    import jax
    import jax.numpy as jnp
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig
    from d3dp_tpu.parallel import make_mesh, batch_sharding, shard_params

    n = len(jax.devices())
    dp = opts.dp or n // opts.tp
    mesh = make_mesh(dp=dp, tp=opts.tp, devices=jax.devices()[: dp * opts.tp])
    on_tpu = jax.devices()[0].platform == "tpu"

    d3dp = D3DP(
        D3DPConfig(
            model=MixSTEConfig(
                num_frames=F, embed_dim=512, depth=8,
                dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                attention_impl="pallas" if on_tpu else "xla",
            ),
            num_proposals=H,
            sampling_timesteps=K,
        )
    )
    params = d3dp.init_params(jax.random.PRNGKey(0))
    if opts.tp > 1:
        params = {"params": shard_params(params["params"], mesh)}

    B = B_PER_CHIP * dp
    rng = np.random.RandomState(0)
    bs = batch_sharding(mesh)
    x2d = jax.device_put(
        jnp.asarray(rng.randn(B, F, J, 2) * 0.3, jnp.float32), bs)
    x2d_f = jax.device_put(
        jnp.asarray(rng.randn(B, F, J, 2) * 0.3, jnp.float32), bs)

    sample = jax.jit(lambda p_, k_: d3dp.sample(p_, k_, x2d, x2d_f))
    sample(params, jax.random.PRNGKey(1)).block_until_ready()

    start = time.perf_counter()
    for i in range(opts.iters):
        out = sample(params, jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    dt = (time.perf_counter() - start) / opts.iters

    total = B * H * F * K / dt
    print(json.dumps({
        "metric": "pod_sampling_hyp_frames_per_sec",
        "value": round(total, 1),
        "unit": "hyp*frames/s aggregate",
        "detail": {
            "per_chip": round(total / (dp * opts.tp), 1),
            "mesh": f"dp={dp} tp={opts.tp}",
            "devices": n,
            "seconds_per_call": round(dt, 4),
        },
    }))


if __name__ == "__main__":
    main()
