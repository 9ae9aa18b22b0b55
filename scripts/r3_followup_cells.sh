#!/bin/bash
# Post-promotion follow-ups, one window:
#  1. train-step decomposition + batch scaling (scripts/train_lab.py)
#  2. batched auto-tile refinement: tb=2 vs tb=4 paired (0.3 ms apart in
#     the promotion sweep — settle whether auto should be 2)
#  3. the ambiguous tb=20 cell re-run under an explicit loop variant
#   nohup script -qec "bash scripts/r3_followup_cells.sh" /dev/null > /tmp/followup.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

echo "== train_lab =="
timeout 2700 python scripts/train_lab.py 2>&1 | grep -v WARNING

run() { echo "== $* =="; env "$@" timeout 2700 python scripts/fwd_bench.py 2>&1 | tail -1; }
run D3DP_TB_ATTN_T=4      # batched (default) tb=4
run D3DP_TB_ATTN_T=2      # batched (default) tb=2
run D3DP_TB_ATTN_T=4      # repeat pair for noise floor
run D3DP_TB_ATTN_T=2
run D3DP_ATTN_VARIANT_T=loop D3DP_TB_ATTN_T=20   # the disambiguated loop/tb20 cell
echo "ALL CELLS DONE"
