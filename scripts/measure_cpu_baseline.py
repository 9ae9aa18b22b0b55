"""Measured same-hardware baseline: the PyTorch reference sampler vs this
rebuild, identical config and inputs, on this box's CPU.

The driver's `vs_baseline` divides a TPU measurement by an ANALYTIC estimate
of the reference on A100 (bench.py docstring) because no published speed
numbers exist. This script grounds that with an actual measurement of the
two IMPLEMENTATIONS on shared silicon: the reference's eval hot path
(D3DP.forward eval -> ddim_sample_flip, common/diffusionpose.py:214-256,
fp32 torch) vs our sampler (fp32, XLA attention parity path) at the same
(B, H, K, F) on CPU. It is an imperfect proxy for A100-vs-TPU — it compares
software stacks, not accelerators — so bench.py reports BOTH bases, each
labeled (detail.baseline_basis).

Writes BASELINE_MEASURED.json at the repo root (committed; bench.py embeds
it in its JSON output).

Usage:  python scripts/measure_cpu_baseline.py [--small]
        (--small: tiny dims for a smoke run; the committed file uses the
        default flagship model dims with H=2 K=2 on F=243 frames)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

JL = [4, 5, 6, 11, 12, 13]
JR = [1, 2, 3, 14, 15, 16]


def parse():
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true",
                   help="tiny dims (smoke test of the harness itself)")
    p.add_argument("--iters", type=int, default=2)
    return p.parse_args()


def main():
    opts = parse()
    if opts.small:
        B, H, K, F, CS, DEP = 1, 2, 2, 27, 64, 2
    else:
        # flagship model dims; H/K reduced so a 1-core fp32 run finishes in
        # minutes (throughput is linear in both H and K rows)
        B, H, K, F, CS, DEP = 1, 2, 2, 243, 512, 8
    J = 17

    import jax

    jax.config.update("jax_platforms", "cpu")

    rng = np.random.RandomState(0)
    x2d = rng.randn(B, F, J, 2).astype(np.float32) * 0.3
    x2d_flip = x2d.copy()
    x2d_flip[..., 0] *= -1
    x2d_flip[:, :, JL + JR] = x2d_flip[:, :, JR + JL]

    # ---- reference (torch, fp32, CPU) ------------------------------------
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from reference_oracle import import_reference

    import torch
    import types

    ref_mod = import_reference("common.diffusionpose")
    torch.manual_seed(0)
    ref_args = types.SimpleNamespace(
        number_of_frames=F, cs=CS, dep=DEP, timestep=1000, scale=1.0,
        test_time_augmentation=True)
    ref_model = ref_mod.D3DP(ref_args, JL, JR, is_train=False,
                             num_proposals=H, sampling_timesteps=K)
    ref_model.eval()

    t2d = torch.from_numpy(x2d)
    t2d_flip = torch.from_numpy(x2d_flip)
    with torch.no_grad():
        ref_model(t2d, None, input_2d_flip=t2d_flip)  # warmup
        t0 = time.perf_counter()
        for _ in range(opts.iters):
            ref_model(t2d, None, input_2d_flip=t2d_flip)
        ref_s = (time.perf_counter() - t0) / opts.iters
    ref_hf = B * H * F * K / ref_s
    print(f"reference torch CPU: {ref_s:.2f} s/call = {ref_hf:.1f} hyp*f/s")

    # ---- rebuild (jax fp32, XLA-attention parity path, CPU) --------------
    import jax.numpy as jnp
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig
    from d3dp_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ours = D3DP(D3DPConfig(
        model=MixSTEConfig(num_frames=F, embed_dim=CS, depth=DEP),
        num_proposals=H, sampling_timesteps=K,
        joints_left=tuple(JL), joints_right=tuple(JR)))
    params = ours.init_params(jax.random.PRNGKey(0))
    sample = jax.jit(lambda p, k: ours.sample(
        p, k, jnp.asarray(x2d), jnp.asarray(x2d_flip)))
    sample(params, jax.random.PRNGKey(1)).block_until_ready()  # compile
    t0 = time.perf_counter()
    for i in range(opts.iters):
        out = sample(params, jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    ours_s = (time.perf_counter() - t0) / opts.iters
    ours_hf = B * H * F * K / ours_s
    print(f"rebuild jax CPU:     {ours_s:.2f} s/call = {ours_hf:.1f} hyp*f/s")

    payload = {
        "config": f"B={B} H={H} K={K} F={F} cs={CS} dep={DEP} fp32 "
                  "flip_tta=on, single CPU core, exact semantics both sides",
        "reference_torch_cpu_hyp_frames_per_sec": round(ref_hf, 2),
        "rebuild_jax_cpu_hyp_frames_per_sec": round(ours_hf, 2),
        "same_hardware_ratio": round(ours_hf / ref_hf, 2),
        "note": "software-stack comparison on shared silicon (1 CPU core); "
                "NOT an A100-vs-TPU number. The analytic A100 estimate "
                "remains the vs_baseline divisor; this grounds it with a "
                "measurement (VERDICT r2 item 3).",
    }
    if not opts.small:
        out_path = os.path.join(ROOT, "BASELINE_MEASURED.json")
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
        print("wrote", out_path)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
