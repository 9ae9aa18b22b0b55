"""Accuracy-verify the bf16-only kernel variants on the converged checkpoint.

The r3 stage/MLP labs measured two candidate bf16 numeric changes on the
real chip (PERFORMANCE.md "r3 stage-lab results"):
  * attention `bf16exp` — softmax exp evaluated in bf16 (-1.8%/-4.2%
    isolated stage time),
  * MLP `bf16gelu` — the A&S erf polynomial evaluated in bf16.
Before either can become the bf16 default, the end-to-end accuracy cost
must be measured on a CONVERGED model, not bounded analytically. This
harness runs the exact sampler (reuse off) on the r2 bf16-qualification
checkpoint with identical DDIM noise and reports P-Best / J-Agg MPJPE
per variant combination.

One process per cell: the variant switches (D3DP_ATTN_VARIANT /
D3DP_MLP_VARIANT) are trace-time state, so they must be pinned in the
environment before the first trace.

Run on TPU (one cell):
  python scripts/variant_eval.py --attn-variant bf16exp --mlp-variant bf16gelu
Smoke (CPU, interpret-mode kernels, random weights):
  python scripts/variant_eval.py --small --platform cpu --attn-variant bf16exp
"""

import argparse
import json
import os
import sys
import time

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
    p.add_argument("--attn-variant", default="",
                   choices=["", "bf16exp", "loop", "batched"],
                   help="D3DP_ATTN_VARIANT for this cell ('loop' pins the "
                        "per-head loop everywhere — the pre-r3-promotion "
                        "default — for accuracy pairing vs the promoted "
                        "batched temporal)")
    p.add_argument("--mlp-variant", default="",
                   choices=["", "bf16gelu"],
                   help="D3DP_MLP_VARIANT for this cell")
    p.add_argument("--subjects", default="S9")
    p.add_argument("--proposals", type=int, default=5)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch", type=int, default=4)
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
    # pin BEFORE any d3dp_tpu import: the switches are read at trace time
    if opts.attn_variant:
        os.environ["D3DP_ATTN_VARIANT"] = opts.attn_variant
    if opts.mlp_variant:
        os.environ["D3DP_MLP_VARIANT"] = opts.mlp_variant

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
    cams, p3, p2 = fetch(data, opts.subjects.split(","))
    gen_args = dict(
        kps_left=data.kps_left, kps_right=data.kps_right,
        joints_left=data.joints_left, joints_right=data.joints_right)

    # the variants are bf16-path changes riding the Pallas kernels; force
    # the pallas impl even on CPU (interpret mode) so smoke runs exercise
    # the exact code path the TPU cells measure
    d3dp = D3DP(D3DPConfig(
        model=MixSTEConfig(num_frames=f, embed_dim=cs, depth=dep,
                           dtype=jnp.bfloat16, attention_impl="pallas"),
        num_proposals=opts.proposals, sampling_timesteps=opts.steps,
        joints_left=tuple(data.joints_left),
        joints_right=tuple(data.joints_right)))

    if opts.small:
        params = d3dp.init_params(jax.random.PRNGKey(0))
    else:
        from d3dp_tpu.train.checkpoint_io import load_any

        ckpt = load_any(opts.ckpt, depth=dep)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        print(f"loaded {opts.ckpt} (epoch {ckpt.get('epoch')})",
              file=sys.stderr)

    ev = Evaluator(d3dp, receptive_field=f, batch_size=opts.batch,
                   kps_left=data.kps_left, kps_right=data.kps_right)
    res = ev.evaluate(params, UnchunkedGenerator(cams, p3, p2, **gen_args),
                      jax.random.PRNGKey(7))
    res.averages_mm()  # drain the warmup's deferred device work
    t0 = time.perf_counter()
    res = ev.evaluate(params, UnchunkedGenerator(cams, p3, p2, **gen_args),
                      jax.random.PRNGKey(7))
    # averages_mm() inside the timed region — EvalResult defers device
    # syncs; the clock stops after the host conversion forces completion
    e = res.averages_mm()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "attn_variant": opts.attn_variant or "default",
        "mlp_variant": opts.mlp_variant or "default",
        "P_Best_mm": round(float(e["P_Best"][-1]), 4),
        "J_Agg_mm": round(float(e["J_Agg"][-1]), 4),
        "seconds": round(dt, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
