#!/bin/bash
# Kernel tile tuning: one in-graph A/B per invocation (each pays a fresh
# XLA+Mosaic compile, ~390-600 s on the tunnelled v5e — run on a HEALTHY
# tunnel, one line at a time, and record winners in PERFORMANCE.md).
# Baseline (defaults): 147.1 ms/forward at the eval shape.
set -x
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
R=${1:-baseline}
case $R in
  baseline)  python -u scripts/fwd_bench.py ;;
  attn_t20)  D3DP_TB_ATTN_T=20 python -u scripts/fwd_bench.py ;;
  attn_t40)  D3DP_TB_ATTN_T=40 python -u scripts/fwd_bench.py ;;
  attn_s120) D3DP_TB_ATTN_S=120 python -u scripts/fwd_bench.py ;;
  attn_s243) D3DP_TB_ATTN_S=243 python -u scripts/fwd_bench.py ;;
  mlp_flat)  D3DP_MLP_FLAT=1 python -u scripts/fwd_bench.py ;;
  mlp48)     D3DP_MLP_TILE_SP=48 D3DP_MLP_TILE_TP=48 python -u scripts/fwd_bench.py ;;
  mlp64)     D3DP_MLP_TILE_SP=64 D3DP_MLP_TILE_TP=64 python -u scripts/fwd_bench.py ;;
  *) echo "unknown experiment $R"; exit 1 ;;
esac
