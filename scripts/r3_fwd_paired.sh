#!/bin/bash
# Paired in-model forward cells, back-to-back in ONE window so tunnel
# drift cannot confound the comparison (the 2026-08-18 unpaired run saw a
# 462.8 ms "default" in a degraded window vs 130.4 ms bf16exp minutes
# later). Run via a pty wrapper to escape the 600 s foreground ceiling:
#   nohup script -qec "bash scripts/r3_fwd_paired.sh" /dev/null > /tmp/fwd_paired.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

run() { echo "== $* =="; env "$@" timeout 900 python scripts/fwd_bench.py 2>&1 | tail -1; }

run D3DP_DUMMY=                      # default control A
run D3DP_ATTN_VARIANT=bf16exp
run D3DP_DUMMY=                      # default control B (drift check)
run D3DP_TB_ATTN_T=10
run D3DP_ATTN_VARIANT=bf16exp D3DP_TB_ATTN_T=10
run D3DP_DUMMY=                      # default control C (drift check)
echo "ALL CELLS DONE"
