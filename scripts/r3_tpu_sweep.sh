#!/bin/bash
# Round-3 TPU measurement plan — run cells individually in FOREGROUND shells
# (the tunnel is unreachable from background processes; see CLAUDE.md).
# Each stage_lab cell is a fresh process because D3DP_ATTN_VARIANT is
# trace-time state. The persistent compile cache makes re-runs cheap.
#
#   bash scripts/r3_tpu_sweep.sh probe     # tunnel health check
#   bash scripts/r3_tpu_sweep.sh stages    # stage-kernel variant sweep
#   bash scripts/r3_tpu_sweep.sh tiles     # unfinished tb=10/20 cells
#   bash scripts/r3_tpu_sweep.sh bench     # canonical bench.py number
#   bash scripts/r3_tpu_sweep.sh reuse     # DDIM-reuse accuracy sweep
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

case "${1:-probe}" in
probe)
  timeout 120 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); print(jax.devices(), round(time.time()-t0,1))
t0=time.time(); print(float(jnp.sum(jnp.ones((1000,1000)))), round(time.time()-t0,2),'s')"
  ;;
stages)
  for stage in temporal spatial; do
    echo "== $stage default =="
    timeout 580 python scripts/stage_lab.py --stage $stage
    echo "== $stage bf16exp =="
    D3DP_ATTN_VARIANT=bf16exp timeout 580 python scripts/stage_lab.py --stage $stage
    echo "== $stage batched (small tb: (h*TB,N,N) logits live in VMEM) =="
    D3DP_ATTN_VARIANT=batched timeout 580 python scripts/stage_lab.py --stage $stage --tb 2
    D3DP_ATTN_VARIANT=batched timeout 580 python scripts/stage_lab.py --stage $stage --tb 4
  done
  ;;
stages2)
  # round-3b cells: serialisation attacks that keep per-head matmuls
  # (identical math; exactness pinned by test_stage_kernel_variants_agree)
  for stage in temporal spatial; do
    echo "== $stage pipelined (QK^T of h+1 issued before softmax of h) =="
    D3DP_ATTN_VARIANT=pipelined timeout 580 python scripts/stage_lab.py --stage $stage
    echo "== $stage phasesplit (one batched softmax over all heads) =="
    D3DP_ATTN_VARIANT=phasesplit timeout 580 python scripts/stage_lab.py --stage $stage
  done
  # grouped spatial attention: fold g 17-token rows into one masked
  # (g*17)-token attention — every MXU op becomes g x bigger (exact math;
  # 9720 % 8 == 9720 % 15 == 0). g=15 -> N'=255 fills the lane tile.
  for g in 8 15; do
    echo "== spatial grouped g=$g =="
    D3DP_SPATIAL_GROUP=$g timeout 580 python scripts/stage_lab.py --stage spatial
  done
  ;;
mlp)
  # MLP-kernel lab: how much of the 4.9/2.9 ms blocks is the erf-GELU's
  # VPU divide/exp traffic? nogelu = diagnostic bound, bf16gelu = candidate
  for stage in mlp_temporal mlp_spatial; do
    echo "== $stage default =="
    timeout 580 python scripts/stage_lab.py --stage $stage
    echo "== $stage nogelu (diagnostic bound) =="
    D3DP_MLP_VARIANT=nogelu timeout 580 python scripts/stage_lab.py --stage $stage
    echo "== $stage bf16gelu =="
    D3DP_MLP_VARIANT=bf16gelu timeout 580 python scripts/stage_lab.py --stage $stage
  done
  ;;
tiles)
  # the r2 sweep's unmeasurable cells (Mosaic compile >10 min through the
  # tunnel): warm the cache patiently, one cell per invocation
  for tb in 10 20; do
    echo "== temporal tb=$tb =="
    timeout 580 python scripts/stage_lab.py --stage temporal --tb $tb ||
      echo "tb=$tb: compile exceeded window — re-run to continue from cache"
  done
  ;;
variants)
  # accuracy gate for promoting the bf16-only kernel variants: exact
  # sampler on the converged qualification checkpoint, identical DDIM
  # noise, one process per cell (trace-time env switches)
  echo "== default =="
  timeout 580 python scripts/variant_eval.py
  echo "== bf16exp =="
  timeout 580 python scripts/variant_eval.py --attn-variant bf16exp
  echo "== bf16gelu =="
  timeout 580 python scripts/variant_eval.py --mlp-variant bf16gelu
  echo "== bf16exp + bf16gelu =="
  timeout 580 python scripts/variant_eval.py --attn-variant bf16exp --mlp-variant bf16gelu
  ;;
fwd)
  # in-model end-to-end forward with the candidate variants (flagship shape)
  echo "== default =="
  timeout 580 python scripts/fwd_bench.py
  echo "== bf16exp + bf16gelu =="
  D3DP_ATTN_VARIANT=bf16exp D3DP_MLP_VARIANT=bf16gelu \
    timeout 580 python scripts/fwd_bench.py
  echo "== temporal tb=10 (isolated -1.7%; 680 % 10 == 0) =="
  D3DP_TB_ATTN_T=10 timeout 580 python scripts/fwd_bench.py
  echo "== all three =="
  D3DP_ATTN_VARIANT=bf16exp D3DP_MLP_VARIANT=bf16gelu D3DP_TB_ATTN_T=10 \
    timeout 580 python scripts/fwd_bench.py
  ;;
resident)
  # depth-resident megakernel (fuse level 5) vs the level-4 pipeline,
  # in-model forward at the flagship shape. The fuse-5 cell is the compile
  # gamble: ONE Mosaic kernel containing a spatial and a temporal
  # stage+MLP body — if it exceeds the 580 s window, re-run (the XLA-side
  # persistent cache still shortens retries) and record the dead end.
  echo "== fuse 4 (control) =="
  D3DP_BENCH_FUSE=4 timeout 580 python scripts/fwd_bench.py
  echo "== fuse 5 (resident) =="
  D3DP_BENCH_FUSE=5 timeout 580 python scripts/fwd_bench.py
  echo "== fuse 5 + unroll (static-start chunk bodies) =="
  D3DP_BENCH_FUSE=5 D3DP_RES_UNROLL=1 timeout 580 python scripts/fwd_bench.py
  ;;
qualtrain)
  # recreate the structured-synthetic qualification checkpoint (the r2 one
  # lived in /tmp and was wiped); -r auto resumes across 600 s windows.
  # Persistent location so later sessions keep it.
  mkdir -p ~/.cache/d3dp_tpu/ckpts/qual_fp32
  timeout 580 python main.py -d synthetic -k structured -e 25 -f 243 \
    -cs 512 -dep 8 -b 972 -s 243 --synthetic-frames 4860 --seed 1 \
    --nolog -c ~/.cache/d3dp_tpu/ckpts/qual_fp32 -r auto --no_eval ||
    echo "window expired — re-run 'qualtrain' to resume"
  ;;
bench)
  timeout 580 python bench.py
  ;;
reuse)
  timeout 580 python scripts/quantify_reuse.py --ckpt ~/.cache/d3dp_tpu/ckpts/qual_fp32/best_epoch.ckpt \
    --out /tmp/reuse_quant.json
  ;;
*)
  echo "unknown cell: $1"; exit 1;;
esac
