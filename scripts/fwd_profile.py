"""Per-op forward profile at the CURRENT default fuse level (real chip).

Refreshes PERFORMANCE.md's "Where the time went" table — the committed
breakdown is the r2-era fuse-2 profile (181 ms/fwd); the shipping sampler
runs fuse-4. Captures a jax.profiler trace of N flip-fused forwards at the
bench eval shape (40 rows), parses the device lanes of the trace, and
aggregates op time into the same categories the r2 profile used
(attention/MLP Pallas kernels = custom-calls, LayerNorm-style
convert+reduce fusions, other elementwise fusions, matmuls, copies,
reshapes).

Run:  nohup script -qec "python scripts/fwd_profile.py" /dev/null \
          > /tmp/fwd_profile.log 2>&1 &
Then read the last stdout line (JSON).
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def categorize(name):
    """HLO-op name -> coarse category (mirrors the r2 profile's rows).

    Order matters: 'convert' must be tested before the matmul patterns
    (a bare "conv" substring test would swallow every convert op) and
    matmul detection is anchored to dot/convolution tokens only.
    """
    n = name.lower()
    if "custom-call" in n or "custom_call" in n or "tpu_custom_call" in n \
            or "mosaic" in n:
        return "pallas kernels (custom-call)"
    if "convert" in n:
        return "converts"
    if "all-reduce" in n or "all-gather" in n or "collective" in n \
            or "reduce-scatter" in n:
        return "collectives"
    if re.search(r"(^|%|\b)dot(\b|\.|_general)", n) or "convolution" in n:
        return "matmuls"
    if "copy" in n:
        return "copies"
    if "reshape" in n or "bitcast" in n or "transpose" in n:
        return "reshapes/transposes"
    if "reduce" in n:
        return "reduce fusions (LN-like)"
    if "fusion" in n:
        return "elementwise fusions"
    return "other"


def parse_trace(trace_dir, n_iters):
    """Aggregate device-lane op durations from the newest .trace.json.gz."""
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        return {"error": f"no trace file under {trace_dir}"}
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # Device lanes: processes whose name mentions the TPU/device. A device
    # process holds SEVERAL overlapping lanes ("Steps", "XLA Modules",
    # "XLA Ops"...) — one module-level event spans the same wall time as
    # all its per-op events, so summing every lane double-counts. Keep only
    # the per-op lane ("XLA Ops" threads); fall back to all lanes minus the
    # obviously aggregate ones when the trace names threads differently.
    proc_names, thread_names = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            proc_names[e.get("pid")] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            thread_names[(e.get("pid"), e.get("tid"))] = (
                e.get("args", {}).get("name", ""))
    device_pids = {pid for pid, nm in proc_names.items()
                   if re.search(r"tpu|device|/device:|tensorcore", nm,
                                re.IGNORECASE)}
    op_lanes = {key for key, nm in thread_names.items()
                if key[0] in device_pids and re.search(
                    r"xla ops", nm, re.IGNORECASE)}
    aggregate_lanes = {key for key, nm in thread_names.items()
                       if key[0] in device_pids and re.search(
                           r"steps|modules|framework|scope", nm,
                           re.IGNORECASE)}

    def in_scope(e):
        key = (e.get("pid"), e.get("tid"))
        if op_lanes:
            return key in op_lanes
        if device_pids:
            return key[0] in device_pids and key not in aggregate_lanes
        # last resort (no metadata): keep HLO-looking rows only
        name = e.get("name", "")
        return name.startswith("%") or "fusion" in name or "custom" in name

    cats, ops, total = {}, {}, 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or not in_scope(e):
            continue
        name = e.get("name", "")
        dur_ms = e["dur"] / 1000.0
        total += dur_ms
        cats[categorize(name)] = cats.get(categorize(name), 0.0) + dur_ms
        key = re.sub(r"\.\d+", "", name)  # fold %fusion.123 -> %fusion
        ops[key] = ops.get(key, 0.0) + dur_ms

    top = sorted(ops.items(), key=lambda kv: -kv[1])[:25]
    return {
        "trace_file": path,
        "device_lanes": sorted(proc_names[p] for p in device_pids),
        "op_lanes": sorted(thread_names[k] for k in op_lanes) or
                    "(no 'XLA Ops' lane found — using all device lanes "
                    "minus aggregates)",
        "total_device_ms_per_fwd": round(total / n_iters, 2),
        "categories_ms_per_fwd": {k: round(v / n_iters, 2)
                                  for k, v in sorted(cats.items(),
                                                     key=lambda kv: -kv[1])},
        "top_ops_ms_per_fwd": [
            {"op": k, "ms": round(v / n_iters, 3)} for k, v in top],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fuse-level", type=int,
                    default=int(os.environ.get("D3DP_BENCH_FUSE", "4")))
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rows", type=int, default=40,
                    help="flip-fused rows (bench eval shape: 2*B*H = 40)")
    ap.add_argument("--trace-dir", default="")
    opts = ap.parse_args()

    from d3dp_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig

    ROWS, F, J = opts.rows, 243, 17
    d3dp = D3DP(D3DPConfig(
        model=MixSTEConfig(num_frames=F, embed_dim=512, depth=8,
                           dtype=jnp.bfloat16, attention_impl="pallas",
                           fuse_level=opts.fuse_level),
        num_proposals=1, sampling_timesteps=1))
    params = d3dp.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x2d = jnp.asarray(rng.randn(ROWS, F, J, 2) * 0.3, jnp.float32)
    x3d0 = jnp.asarray(rng.randn(ROWS, F, J, 3) * 0.3, jnp.float32)
    t = jnp.zeros((ROWS,), jnp.int32)

    fwd = jax.jit(lambda p, x: d3dp.model.apply(p, x2d, x, t,
                                                deterministic=True))
    t0 = time.time()
    out = fwd(params, x3d0)
    _ = float(jnp.sum(out))
    print(f"compile {time.time()-t0:.0f}s", flush=True)

    # timed reference (no profiler overhead)
    t0 = time.time()
    x = x3d0
    for _ in range(opts.iters):
        x = fwd(params, x * 0.999)
    _ = float(jnp.sum(x))
    ms_clean = (time.time() - t0) / opts.iters * 1000

    trace_dir = opts.trace_dir or tempfile.mkdtemp(prefix="d3dp_prof_")
    with jax.profiler.trace(trace_dir):
        x = x3d0
        for _ in range(opts.iters):
            x = fwd(params, x * 0.999)
        _ = float(jnp.sum(x))

    result = parse_trace(trace_dir, opts.iters)
    result["fuse_level"] = opts.fuse_level
    result["rows"] = ROWS
    result["ms_per_fwd_untraced"] = round(ms_clean, 2)
    result["device"] = str(jax.devices()[0])
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
