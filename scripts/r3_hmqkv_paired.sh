#!/bin/bash
# Paired in-model forward cells for the hmqkv (head-major weight-packed)
# attention variant vs the promoted default (batched temporal + loop
# spatial). Back-to-back in ONE window so tunnel drift cannot confound the
# comparison. Run via a pty wrapper:
#   nohup script -qec "bash scripts/r3_hmqkv_paired.sh" /dev/null > /tmp/hmqkv_paired.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

run() { echo "== $* =="; env "$@" timeout 1500 python scripts/fwd_bench.py 2>&1 | tail -1; }

run D3DP_DUMMY=                        # default control A (batched T, loop S)
run D3DP_ATTN_VARIANT_T=hmqkv          # head-major temporal only
run D3DP_ATTN_VARIANT_S=hmqkv          # head-major spatial only
run D3DP_ATTN_VARIANT=hmqkv            # head-major both stages
run D3DP_DUMMY=                        # default control B (drift check)
echo "ALL CELLS DONE"
