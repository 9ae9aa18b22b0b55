"""bf16-training convergence gate: fp32-XLA vs auto-promoted bf16-Pallas.

The training default promotes `--attention auto --dtype bfloat16` on TPU to
the Pallas 4.3x fast path. r2 qualified it with a 22-epoch trajectory-parity
check + flagship gradient cosine; this gate adds the end-to-end evidence the
r4 verdict demanded: two IDENTICAL full training runs (same data, seed and
batch order; only the training dtype/kernel path differs), compared on final
eval MPJPE across ALL FOUR aggregation modes and every DDIM step, under ONE
fixed eval configuration (bf16 fast-path sampler, H/K from flags, same PRNG
key) so the delta isolates the *training* path.

Pass criterion (per mode, final DDIM step): |bf16 − fp32| ≤ max(0.5 mm,
1% of the fp32 value) — the r2 trajectory-parity noise envelope. On failure
the auto-promotion must be demoted (models built in cli/main_h36m.py:39-46).

Run (after the two r5 campaign training arms):
  python scripts/ab_gate.py --ckpt-fp32 ~/.cache/d3dp_tpu/ckpts/r5_fp32 \
      --ckpt-bf16 ~/.cache/d3dp_tpu/ckpts/r5_bf16 --out /tmp/r5_ab_gate.json
Smoke (CPU): python scripts/ab_gate.py --small --platform cpu
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def parse():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-fp32", default="", help="checkpoint FILE or DIR "
                   "(dir -> newest epoch_*, falling back to best_epoch)")
    p.add_argument("--ckpt-bf16", default="")
    p.add_argument("--platform", default="")
    p.add_argument("--small", action="store_true",
                   help="tiny model + fresh random weights (harness smoke)")
    p.add_argument("--proposals", type=int, default=20)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--subjects", default="S9")
    p.add_argument("--synthetic-frames", type=int, default=24300,
                   help="MUST match the training runs' value: the synthetic "
                        "test split depends on it")
    p.add_argument("--eval-dtype", default="bfloat16",
                   help="held fixed across both arms (isolates training)")
    p.add_argument("--key", type=int, default=23,
                   help="eval PRNG seed (same for both arms). Rerunning the "
                        "gate under several keys separates DDIM sampling "
                        "noise from a systematic training-path difference — "
                        "the oracle-min modes (J_Best) are tail statistics "
                        "and fluctuate more than the deployed J_Agg")
    p.add_argument("--out", default="")
    return p.parse_args()


def resolve(path):
    """Checkpoint path -> itself; checkpoint DIR -> latest_checkpoint
    (newest epoch_*, else best_epoch — the same resolver `-r auto` uses).
    Note orbax checkpoints are themselves directories, hence the suffix
    test rather than isdir alone."""
    if not os.path.isdir(path) or path.rstrip("/").endswith(
            (".ckpt", ".orbax", ".bin")):
        return path
    from d3dp_tpu.train.checkpoint_io import latest_checkpoint

    found = latest_checkpoint(path)
    if not found:
        sys.exit(f"no checkpoint under {path}")
    return found


def train_log_tail(ckpt_path, n=5):
    """Last n per-epoch lines of the arm's training_log.txt (loss curves)."""
    d = ckpt_path if os.path.isdir(ckpt_path) else os.path.dirname(ckpt_path)
    log = os.path.join(d, "training_log.txt")
    if not os.path.exists(log):
        return []
    with open(log) as f:
        lines = [l.strip() for l in f if l.startswith("[")]
    return lines[-n:]


def main():
    opts = parse()
    import jax

    if opts.platform:
        jax.config.update("jax_platforms", opts.platform)
    from d3dp_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    from d3dp_tpu.cli.arguments import parse_args as cli_parse
    from d3dp_tpu.cli.data_prep import prepare_data, fetch
    from d3dp_tpu.data.generators import UnchunkedGenerator
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig
    from d3dp_tpu.eval import Evaluator

    if opts.small:
        f, cs, dep, frames = 27, 64, 2, 540
    else:
        f, cs, dep, frames = 243, 512, 8, opts.synthetic_frames
    args = cli_parse([
        "-d", "synthetic", "-k", "structured", "--nolog",
        "-f", str(f), "-cs", str(cs), "-dep", str(dep),
        "--synthetic-frames", str(frames), "--seed", "1",
        "-ste", opts.subjects,
    ])
    data = prepare_data(args)
    cams, p3, p2 = fetch(data, opts.subjects.split(","))
    gen_args = dict(
        kps_left=data.kps_left, kps_right=data.kps_right,
        joints_left=data.joints_left, joints_right=data.joints_right)

    dtype = jnp.bfloat16 if opts.eval_dtype == "bfloat16" else jnp.float32
    on_tpu = jax.devices()[0].platform == "tpu"
    d3dp = D3DP(D3DPConfig(
        model=MixSTEConfig(num_frames=f, embed_dim=cs, depth=dep,
                           dtype=dtype,
                           attention_impl="pallas" if on_tpu else "xla"),
        num_proposals=opts.proposals, sampling_timesteps=opts.steps,
        joints_left=tuple(data.joints_left),
        joints_right=tuple(data.joints_right)))
    ev = Evaluator(d3dp, receptive_field=f, batch_size=opts.batch,
                   kps_left=data.kps_left, kps_right=data.kps_right)

    def load(path, arm_idx=0):
        if opts.small:
            # distinct per-arm weights so the smoke exercises real deltas
            return d3dp.init_params(jax.random.PRNGKey(41 + arm_idx))
        from d3dp_tpu.train.checkpoint_io import load_any

        ckpt = load_any(path, depth=dep)
        print(f"loaded {path} (epoch {ckpt.get('epoch')})")
        return jax.tree_util.tree_map(jnp.asarray, ckpt["params"])

    arms = {}
    for arm_idx, (name, path) in enumerate(
            (("fp32", opts.ckpt_fp32 or "small"),
             ("bf16", opts.ckpt_bf16 or "small"))):
        resolved = path if opts.small else resolve(path)
        params = load(resolved, arm_idx)
        gen = UnchunkedGenerator(cams, p3, p2, augment=False, **gen_args)
        t0 = time.perf_counter()
        # SAME key both arms: identical DDIM noise, delta is the weights
        res = ev.evaluate(params, gen, jax.random.PRNGKey(opts.key))
        e = {m: [round(float(x), 3) for x in v]
             for m, v in res.averages_mm().items()}
        arms[name] = {
            "ckpt": resolved, "modes_mm_per_step": e,
            "seconds": round(time.perf_counter() - t0, 1),
            "train_log_tail": train_log_tail(path),
        }
        print(json.dumps({name: {m: v[-1] for m, v in e.items()}}))

    modes = ("J_Best", "P_Best", "P_Agg", "J_Agg")
    deltas, passed = {}, True
    for m in modes:
        a = arms["fp32"]["modes_mm_per_step"][m][-1]
        b = arms["bf16"]["modes_mm_per_step"][m][-1]
        tol = max(0.5, 0.01 * a)
        ok = abs(b - a) <= tol
        deltas[m] = {"fp32_mm": a, "bf16_mm": b,
                     "delta_mm": round(b - a, 3), "tol_mm": round(tol, 3),
                     "pass": ok}
        passed = passed and ok

    verdict = {
        "gate": "bf16_train_convergence",
        "config": f"H={opts.proposals} K={opts.steps} eval={opts.eval_dtype} "
                  f"subjects={opts.subjects} frames={frames} key={opts.key}",
        "final_step_deltas": deltas,
        "pass": passed,
        "criterion": "per mode, final DDIM step: |bf16-fp32| <= "
                     "max(0.5mm, 1% of fp32)",
        "arms": arms,
    }
    print(json.dumps({"gate_pass": passed, "final_step_deltas": deltas}))
    if opts.out:
        with open(opts.out, "w") as fh:
            json.dump(verdict, fh, indent=1)
        print("wrote", opts.out)


if __name__ == "__main__":
    main()
