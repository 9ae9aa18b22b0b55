#!/bin/bash
# In-model paired cells for the r3 long-window discoveries: the `batched`
# head-major variant wins the ISOLATED temporal stage (-8.7% at tb=4) and
# tb=20 wins -4.9% — do they survive in-model? Same-window pairing with
# interleaved controls (the bf16exp lesson: isolated wins can vanish).
#   nohup script -qec "bash scripts/r3_batched_paired.sh" /dev/null > /tmp/batched_paired.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

run() { echo "== $* =="; env "$@" timeout 2700 python scripts/fwd_bench.py 2>&1 | tail -1; }

run D3DP_DUMMY=                                     # control A
run D3DP_ATTN_VARIANT_T=batched                     # auto tb -> 4
run D3DP_ATTN_VARIANT_T=batched D3DP_TB_ATTN_T=2
run D3DP_DUMMY=                                     # control B
run D3DP_TB_ATTN_T=20                               # default variant, big tile
run D3DP_ATTN_VARIANT_T=batched D3DP_TB_ATTN_T=8    # batched at the default tile
run D3DP_DUMMY=                                     # control C
echo "ALL CELLS DONE"
