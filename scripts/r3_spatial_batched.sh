#!/bin/bash
# The missed cell: spatial `batched` was only measured at tb=2 (the +55%
# LOST verdict) — 32x below the spatial stage's native auto tile (64),
# where the per-head scratch copies amortise over 32x more rows and the
# (8*tb,17,17) logits stack is still tiny (2.4 MB at tb=64). Isolated
# sweep first; if a cell beats the loop control, pair it in-model with
# D3DP_ATTN_VARIANT_S=batched.
#   nohup script -qec "bash scripts/r3_spatial_batched.sh" /dev/null > /tmp/spatial_batched.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

cell() { echo "== $* =="; env "$@" timeout 2700 python scripts/stage_lab.py "${ARGS[@]}" 2>&1 | tail -1; }

ARGS=(--stage spatial);          cell D3DP_DUMMY=                    # loop control (auto tb=64)
ARGS=(--stage spatial --tb 16);  cell D3DP_ATTN_VARIANT_S=batched
ARGS=(--stage spatial --tb 32);  cell D3DP_ATTN_VARIANT_S=batched
ARGS=(--stage spatial --tb 64);  cell D3DP_ATTN_VARIANT_S=batched
ARGS=(--stage spatial --tb 128); cell D3DP_ATTN_VARIANT_S=batched
ARGS=(--stage spatial);          cell D3DP_DUMMY=                    # drift check
echo "ALL CELLS DONE"
