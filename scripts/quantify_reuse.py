"""Quantify the DDIM feature-reuse accuracy/speed trade-off.

Uses the r2 bf16-qualification checkpoint (a converged structured-synthetic
flagship run: `python main.py -d synthetic -k structured -e 25 -f 243
-cs 512 -dep 8 -b 972 -s 243 --synthetic-frames 4860 --seed 1`) and sweeps
`(reuse_interval, reuse_tap, reuse_tau)` against the exact sampler on the
synthetic test split, reporting P-Best / J-Agg MPJPE deltas and measured
speedups. The same PRNG key drives every config, so deltas are purely the
reuse approximation (the exact-when-off path is pinned separately by
tests/test_ddim_reuse.py).

Run on TPU:  python scripts/quantify_reuse.py --ckpt ~/.cache/d3dp_tpu/ckpts/qual_fp32/best_epoch.ckpt
Smoke (CPU): python scripts/quantify_reuse.py --small --platform cpu
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
    p.add_argument("--ckpt", default="", help="defaults to best_epoch.ckpt "
               "in the qualification dir, falling back to the newest "
               "periodic epoch_*.ckpt (--no_eval runs never write a best)")
    p.add_argument("--platform", default="")
    p.add_argument("--small", action="store_true",
                   help="tiny model + fresh random weights (harness smoke)")
    p.add_argument("--dtype", default="bfloat16",
                   help="eval dtype (reuse targets the bf16 fast path)")
    p.add_argument("--subjects", default="S9")
    p.add_argument("--proposals", type=int, default=5)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--out", default="")
    return p.parse_args()


def resolve_ckpt(path):
    """'' -> best_epoch.ckpt in the qualification dir, else the newest
    periodic epoch_*.ckpt (--no_eval qualtrain runs never write a best —
    and the fp32 eval compile currently trips the remote-compile helper's
    HTTP 500, so periodic saves may be all there is)."""
    if path:
        return path
    import glob
    import re

    d = os.path.expanduser("~/.cache/d3dp_tpu/ckpts/qual_fp32")
    best = os.path.join(d, "best_epoch.ckpt")
    if os.path.exists(best):
        return best
    cands = glob.glob(os.path.join(d, "epoch_*.ckpt"))
    if not cands:
        sys.exit(f"no checkpoint in {d} -- run: bash scripts/r3_tpu_sweep.sh qualtrain")
    return max(cands,
               key=lambda p: int(re.search(r"epoch_(\d+)", p).group(1)))


def main():
    opts = parse()
    opts.ckpt = resolve_ckpt(opts.ckpt)
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
        f, cs, dep, frames = 243, 512, 8, 4860
    args = cli_parse([
        "-d", "synthetic", "-k", "structured", "--nolog",
        "-f", str(f), "-cs", str(cs), "-dep", str(dep),
        "--synthetic-frames", str(frames), "--seed", "1",
        "-ste", opts.subjects,
    ])
    data = prepare_data(args)

    # test split: same fetch as run_evaluation, all actions of the subjects
    subjects = opts.subjects.split(",")
    cams, p3, p2 = fetch(data, subjects)
    gen_args = dict(
        kps_left=data.kps_left, kps_right=data.kps_right,
        joints_left=data.joints_left, joints_right=data.joints_right)

    dtype = jnp.bfloat16 if opts.dtype == "bfloat16" else jnp.float32
    on_tpu = jax.devices()[0].platform == "tpu"
    impl = "pallas" if on_tpu else "xla"

    def build(reuse, tap, tau):
        return D3DP(D3DPConfig(
            model=MixSTEConfig(num_frames=f, embed_dim=cs, depth=dep,
                               dtype=dtype, attention_impl=impl),
            num_proposals=opts.proposals, sampling_timesteps=opts.steps,
            joints_left=tuple(data.joints_left),
            joints_right=tuple(data.joints_right),
            reuse_interval=reuse, reuse_tap=max(1, min(tap, dep)),
            reuse_tau=tau))

    if opts.small:
        params = build(1, 1, 0.0).init_params(jax.random.PRNGKey(0))
    else:
        from d3dp_tpu.train.checkpoint_io import load_any

        ckpt = load_any(opts.ckpt, depth=dep)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        print(f"loaded {opts.ckpt} (epoch {ckpt.get('epoch')})")

    grid = [
        ("exact", 1, dep, 0.0),
        ("r2/t4", 2, 4, 0.0),
        ("r2/t2", 2, 2, 0.0),
        ("r2/t1", 2, 1, 0.0),
        ("r3/t2", 3, 2, 0.0),
        ("r4/t2", 4, 2, 0.0),
        ("r5/t2", 5, 2, 0.0),
        ("r3/t2+tau0.05", 3, 2, 0.05),
        ("r3/t2+tau0.10", 3, 2, 0.10),
        ("r5/t2+tau0.15", 5, 2, 0.15),
    ]
    rows = []
    base = None
    for name, reuse, tap, tau in grid:
        d3dp = build(reuse, tap, tau)
        ev = Evaluator(d3dp, receptive_field=f, batch_size=opts.batch,
                       kps_left=data.kps_left, kps_right=data.kps_right)
        gen = UnchunkedGenerator(cams, p3, p2, **gen_args)
        t0 = time.perf_counter()
        # fixed key: identical DDIM noise across configs
        res = ev.evaluate(params, gen, jax.random.PRNGKey(7))
        res.averages_mm()  # drain deferred device work before re-timing
        dt = time.perf_counter() - t0
        # second pass for a compile-free timing; averages_mm() inside the
        # timed region — EvalResult defers device syncs, so the clock must
        # stop only after the host conversion forces completion
        gen = UnchunkedGenerator(cams, p3, p2, **gen_args)
        t0 = time.perf_counter()
        res = ev.evaluate(params, gen, jax.random.PRNGKey(7))
        e = res.averages_mm()
        dt = time.perf_counter() - t0
        row = {
            "config": name, "reuse": reuse, "tap": tap, "tau": tau,
            "P_Best_mm": round(float(e["P_Best"][-1]), 3),
            "J_Agg_mm": round(float(e["J_Agg"][-1]), 3),
            "seconds": round(dt, 2),
        }
        if base is None:
            base = row
        row["dP_Best_mm"] = round(row["P_Best_mm"] - base["P_Best_mm"], 3)
        row["dJ_Agg_mm"] = round(row["J_Agg_mm"] - base["J_Agg_mm"], 3)
        row["speedup"] = round(base["seconds"] / row["seconds"], 2)
        rows.append(row)
        print(json.dumps(row))

    print("\n| config | P-Best (mm) | dP-Best | J-Agg (mm) | dJ-Agg | speedup |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['P_Best_mm']} | {r['dP_Best_mm']:+} | "
              f"{r['J_Agg_mm']} | {r['dJ_Agg_mm']:+} | {r['speedup']}x |")
    if opts.out:
        with open(opts.out, "w") as fh:
            json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
