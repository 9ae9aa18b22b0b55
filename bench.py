"""Benchmark: DDIM sampling throughput of the flagship D3DP model on one chip.

Config = the paper's quick-eval headline (README.md:37-40 of the reference):
H=5 proposals, K=5 DDIM steps, batch of 4 windows x 243 frames x 17 joints,
flip test-time augmentation on — i.e. per call the sampler runs K scan steps,
each one flip-fused MixSTE2 forward over a 2*B*H batch, and emits all K
intermediate hypothesis sets (B,K,H,F,17,3), exactly what the evaluator
scores.

Metric: hypothesis-frames per second per chip =
    B * H * F * K / wall_seconds_per_call
counting every DDIM iteration's emitted hypothesis set (all K are returned
and scored by the metric suite, reference loss.py:78-107).

vs_baseline: ratio to an ANALYTIC estimate of the PyTorch reference on A100:
the reference runs 2 separate fp32 forwards per DDIM step (flip TTA,
diffusionpose.py:155-156; fp32 CUDA cores — torch matmul TF32 is off by
default and the reference pins deterministic kernels, main.py:38-39).
FLOPs/forward ~= 2 * params(33.7e6) * token-positions(B*H*F*17) = 5.57 TF;
at 35% util of 19.5 fp32 TFLOP/s -> ~8.2 s/call -> ~3000 hyp-frames/s.
REFERENCE_HF_PER_SEC below freezes that estimate.
"""

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_HF_PER_SEC = 3000.0  # analytic estimate, NOT a measurement —
# derivation in the module docstring; `baseline_basis` in the JSON labels it

B, H, K, F, J = 4, 5, 5, 243, 17


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ddim-reuse", type=int, default=0,
                   help="measure with DDIM feature reuse at this refresh "
                        "interval (0 = off, the canonical driver number)")
    p.add_argument("--ddim-reuse-tap", type=int, default=2)
    p.add_argument("--fuse-level", type=int, default=4,
                   choices=[0, 1, 2, 3, 4, 5],
                   help="Pallas kernel-fusion ladder level (see "
                        "d3dp_tpu/models/mixste.py MixSTEConfig)")
    p.add_argument("--train-batch", type=int, default=4,
                   help="batch (chunks of 243 frames) for the secondary "
                        "train metric; 4 = the reference eval-command batch "
                        "semantics (main.py:325). The r5 batch-scaling "
                        "curve (PERFORMANCE.md) shows where throughput "
                        "saturates; pass a larger batch to reproduce it")
    p.add_argument("--dp", type=int, default=0,
                   help="scaling mode: shard the sampler over a dp-way mesh "
                        "of N VIRTUAL CPU devices and report relative "
                        "scaling (correctness/compile evidence, not absolute "
                        "TPU throughput)")
    return p.parse_args()


def _baseline_basis():
    """Both derivations of the reference's speed, each labeled.

    - analytic: the frozen A100 estimate REFERENCE_HF_PER_SEC divides
      vs_baseline (no published speed numbers exist to measure against).
    - measured: same-hardware CPU ratio (torch reference sampler vs this
      rebuild, identical config/inputs on this box's CPU) produced by
      scripts/measure_cpu_baseline.py and committed to
      BASELINE_MEASURED.json — an imperfect A100-vs-TPU proxy, but an
      actual measurement of the two implementations on shared silicon.
    """
    basis = {
        "analytic_a100": "PyTorch reference on A100, fp32, 35% util => "
                         "~3000 hyp*frames/s (derivation in bench.py "
                         "docstring); divides vs_baseline",
    }
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            basis["measured_cpu_same_hardware"] = json.load(f)
    return basis


def main(opts=None):
    opts = opts or parse_args()
    if opts.dp:
        return scaling_mode(opts.dp)
    from d3dp_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig

    dev = jax.devices()[0]

    # Remote-TPU tunnel health gate: the tunnel's throughput varies wildly
    # over hours; timing in a degraded window records a falsely slow number.
    # Probe with a trivial op and wait (bounded) for a healthy window before
    # measuring — on local devices (CPU tests, real pods) the probe passes
    # instantly and this is a no-op. If all probes fail we still measure,
    # but the emitted JSON carries "tunnel_degraded": true so a falsely
    # slow record is distinguishable downstream.
    tunnel_degraded = False
    for attempt in range(8):
        t0 = time.perf_counter()
        float(jnp.sum(jnp.ones((1024, 1024))))
        if time.perf_counter() - t0 < 20.0:
            tunnel_degraded = False
            break
        tunnel_degraded = True
        print(f"# tunnel degraded (probe {time.perf_counter()-t0:.0f}s); "
              "waiting for a healthy window", file=sys.stderr, flush=True)
        time.sleep(60)

    reuse = max(opts.ddim_reuse, 1)
    d3dp = D3DP(
        D3DPConfig(
            model=MixSTEConfig(
                num_frames=F,
                embed_dim=512,
                depth=8,
                dtype=jnp.bfloat16,  # fast path; fp32 parity is tested in CI
                attention_impl="pallas",  # fused VMEM-resident attention
                fuse_level=opts.fuse_level,
            ),
            num_proposals=H,
            sampling_timesteps=K,
            reuse_interval=reuse,
            reuse_tap=max(1, min(opts.ddim_reuse_tap, 8)),
        )
    )
    params = d3dp.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    x2d = jnp.asarray(rng.randn(B, F, J, 2) * 0.3, jnp.float32)
    x2d_flip = jnp.asarray(rng.randn(B, F, J, 2) * 0.3, jnp.float32)

    sample = jax.jit(lambda p, k: d3dp.sample(p, k, x2d, x2d_flip))

    # warmup/compile
    sample(params, jax.random.PRNGKey(1)).block_until_ready()

    n_iter = 10
    keys = [jax.random.PRNGKey(i) for i in range(2, 2 + n_iter)]
    start = time.perf_counter()
    for k in keys:
        out = sample(params, k)
    out.block_until_ready()
    elapsed = (time.perf_counter() - start) / n_iter

    hf_per_sec = B * H * F * K / elapsed
    # achieved model FLOP rate: K denoise steps, flip-TTA doubles the rows,
    # ~2*params FLOPs per token position (actual param count, not nominal)
    params_n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    rows = 2 * B * H  # flip-fused batch
    # with --ddim-reuse, only every `reuse`-th step runs the full depth; the
    # others run ~tap of 8 block pairs — scale the per-step cost accordingly
    # so reuse mode doesn't overstate the achieved FLOP rate
    if reuse > 1:
        tap = max(1, min(opts.ddim_reuse_tap, 8))
        # the final step is always a forced refresh (d3dp.py reuse schedule)
        full_steps = len(set(range(0, K, reuse)) | {K - 1})
        step_cost = (full_steps + (K - full_steps) * tap / 8.0) / K
    else:
        step_cost = 1.0
    model_tflops = K * step_cost * 2 * params_n * rows * F * J / elapsed / 1e12

    # secondary: training-step throughput at the reference batch size
    # (4 chunks x 243 frames; bf16 compute + custom-VJP pallas attention,
    # fp32 master weights — the fast training path; the fp32+xla parity
    # path runs at ~4.4k frames/s)
    from d3dp_tpu.train.state import TrainState, make_optimizer, make_train_step

    d3dp_tr = D3DP(
        D3DPConfig(
            model=MixSTEConfig(num_frames=F, embed_dim=512, depth=8,
                               drop_path_rate=0.1, dtype=jnp.bfloat16,
                               attention_impl="pallas"),
            num_proposals=1, sampling_timesteps=1,
        )
    )
    tx = make_optimizer(6e-5)
    state = TrainState.create(d3dp_tr.init_params(jax.random.PRNGKey(0)), tx)
    step = make_train_step(d3dp_tr, tx, donate=False)
    Bt = max(opts.train_batch, 1)
    x2d_tr = jnp.asarray(rng.randn(Bt, F, J, 2) * 0.3, jnp.float32)
    x3d = jnp.asarray(rng.randn(Bt, F, J, 3) * 0.3, jnp.float32)
    w = jnp.ones((Bt,), jnp.float32)
    state, loss = step(state, jax.random.PRNGKey(1), x2d_tr, x3d, w)
    _ = float(loss)
    n_tr = 10
    start = time.perf_counter()
    for i in range(n_tr):
        state, loss = step(state, jax.random.PRNGKey(2 + i), x2d_tr, x3d, w)
    _ = float(loss)
    train_elapsed = (time.perf_counter() - start) / n_tr
    train_frames_per_sec = Bt * F / train_elapsed
    # achieved train FLOP rate: fwd (2P per token) + bwd (~2x fwd) = ~6P
    # per token position, Bt rows (no flip fold in training)
    train_tflops = 6 * params_n * Bt * F * J / train_elapsed / 1e12

    # tertiary: END-TO-END evaluator throughput (windowing + flip prep +
    # sampling + JPMA + all four P1 modes), with Protocol-2 off / on host
    # numpy / on device — makes the host-side eval cost first-class
    # (reference evaluate loop: main.py:596-794)
    eval_e2e = _eval_e2e_bench(d3dp, params)

    print(
        json.dumps(
            {
                "metric": "sampling_hypothesis_frames_per_sec_per_chip",
                "value": round(hf_per_sec, 1),
                "unit": "hyp*frames/s",
                "vs_baseline": round(hf_per_sec / REFERENCE_HF_PER_SEC, 2),
                "detail": {
                    "config": f"B={B} H={H} K={K} F={F} flip_tta=on bf16"
                              + (f" reuse={reuse}/tap={opts.ddim_reuse_tap}"
                                 if reuse > 1 else ""),
                    "seconds_per_call": round(elapsed, 4),
                    "model_tflops_per_sec": round(model_tflops, 1),
                    "train_frames_per_sec": round(train_frames_per_sec, 1),
                    "train_model_tflops_per_sec": round(train_tflops, 1),
                    "train_seconds_per_step": round(train_elapsed, 4),
                    "train_batch": Bt,
                    "eval_e2e": eval_e2e,
                    "tunnel_degraded": tunnel_degraded,
                    "device": str(dev),
                    "baseline_basis": _baseline_basis(),
                },
            }
        )
    )


def _eval_e2e_bench(d3dp, params, rf=F, bs=B, lengths=(300, 250, 400, 486, 729),
                    label=f"H={H} K={K} flip_tta=on bf16"):
    """Evaluated-sequences/s through the full Evaluator loop.

    Three cells over the same synthetic sequences (default: 5 seqs, 2165
    frames, 11 windows -> 3 micro-batches at bs=4): Protocol-2 off, P2 on
    host numpy (reference-parity path), P2 on device (--p2-device jnp SVD).
    Each cell runs one warm-up pass (compile) and times a second pass;
    averages_mm() inside the timed region forces the deferred device work
    (EvalResult defers syncs). Failures are recorded per cell rather than
    killing the primary metric. rf/bs/lengths are parameters so the CPU
    test suite can smoke this exact code path at tiny dims.
    """
    import jax

    from d3dp_tpu.data.generators import UnchunkedGenerator
    from d3dp_tpu.data.synthetic import make_dataset, JOINTS_LEFT, JOINTS_RIGHT
    from d3dp_tpu.eval import Evaluator

    cams, p3, p2 = make_dataset(seed=3, lengths=lengths)
    n_seq, n_frames = len(lengths), sum(lengths)
    gen_kw = dict(kps_left=list(JOINTS_LEFT), kps_right=list(JOINTS_RIGHT),
                  joints_left=list(JOINTS_LEFT), joints_right=list(JOINTS_RIGHT))

    out = {"config": f"{n_seq} seqs / {n_frames} frames / bs={bs} {label}"}
    cells = (("p2_off", {}),
             ("p2_host", {"p2": True}),
             ("p2_device", {"p2_device": True}))
    for name, kw in cells:
        try:
            ev = Evaluator(d3dp, receptive_field=rf, batch_size=bs,
                           kps_left=list(JOINTS_LEFT),
                           kps_right=list(JOINTS_RIGHT), **kw)

            def run():
                gen = UnchunkedGenerator(cams, p3, p2, augment=False, **gen_kw)
                res = ev.evaluate(params, gen, jax.random.PRNGKey(11))
                res.averages_mm()  # drain deferred device work
                if kw:
                    res.averages_p2_mm()
                return res

            run()  # compile + warm
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            out[name] = {"sequences_per_sec": round(n_seq / dt, 2),
                         "frames_per_sec": round(n_frames / dt, 1),
                         "seconds": round(dt, 3)}
        except Exception as e:  # noqa: BLE001 — cell-level fault isolation
            out[name] = {"error": str(e)[:200]}
    if "seconds" in out.get("p2_off", {}) and "seconds" in out.get("p2_host", {}):
        out["p2_host_overhead_frac"] = round(
            1.0 - out["p2_off"]["seconds"] / out["p2_host"]["seconds"], 3)
    if "seconds" in out.get("p2_host", {}) and "seconds" in out.get("p2_device", {}):
        out["p2_device_speedup_vs_host"] = round(
            out["p2_host"]["seconds"] / out["p2_device"]["seconds"], 2)
    return out


def scaling_mode(n_devices):
    """--dp N: shard the sampler over an N-way virtual CPU mesh and print
    per-device-count timings at a reduced model size. Evidence that the
    sharded program compiles and executes at every dp and that per-device
    work is constant (weak scaling) — NOT absolute TPU throughput: the
    virtual devices all share the host's cores, so wall-clock flattens at
    the host's own parallelism. Real-pod numbers: scripts/bench_pod.py."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
    import jax.numpy as jnp
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig
    from d3dp_tpu.parallel import make_mesh, batch_sharding

    f, h, k = 27, 2, 2  # reduced dims: CPU-feasible, same program structure
    d3dp = D3DP(
        D3DPConfig(
            model=MixSTEConfig(num_frames=f, embed_dim=128, depth=2),
            num_proposals=h,
            sampling_timesteps=k,
        )
    )
    params = d3dp.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)

    results = {}
    for dp in sorted({1, max(n_devices // 2, 1), n_devices}):
        mesh = make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])
        bs = batch_sharding(mesh)
        b = 4 * dp  # fixed per-device work: 4 windows each (weak scaling)
        x2d = jax.device_put(
            jnp.asarray(rng.randn(b, f, J, 2) * 0.3, jnp.float32), bs)
        x2d_f = jax.device_put(
            jnp.asarray(rng.randn(b, f, J, 2) * 0.3, jnp.float32), bs)
        sample = jax.jit(lambda p, key: d3dp.sample(p, key, x2d, x2d_f))
        sample(params, jax.random.PRNGKey(1)).block_until_ready()
        n_iter = 5
        start = time.perf_counter()
        for i in range(n_iter):
            out = sample(params, jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        dt = (time.perf_counter() - start) / n_iter
        results[dp] = round(b * h * f * k / dt, 1)

    base = results[1]
    dpmax = max(results)
    print(json.dumps({
        "metric": "virtual_mesh_dp_scaling",
        "value": round(results[dpmax] / base, 3),
        "unit": "total-throughput retention dp=1->max (virtual devices "
                "share the host's cores, so flat total = zero sharding "
                "overhead; real chips would scale the total linearly)",
        "vs_baseline": 1.0,
        "detail": {"hyp_frames_per_sec_by_dp": results,
                   "note": "virtual CPU mesh sharing host cores; proves the "
                           "dp-sharded sampler compiles/executes at each dp "
                           "with constant per-device batch; real-pod "
                           "script: scripts/bench_pod.py"},
    }))


if __name__ == "__main__":
    main()
