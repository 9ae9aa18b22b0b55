#!/bin/bash
# Resident-megakernel (fuse 5) retry with the static-start unrolled chunk
# bodies (D3DP_RES_UNROLL=1) whose Mosaic compile exceeded the old 580 s
# foreground window. Run pty-wrapped (no ceiling), all cells one window:
#   nohup script -qec "bash scripts/r3_resident_paired.sh" /dev/null > /tmp/resident.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

run() { echo "== $* =="; env "$@" timeout 3000 python scripts/fwd_bench.py 2>&1 | tail -1; }

run D3DP_BENCH_FUSE=4                       # control
run D3DP_BENCH_FUSE=5                       # chunk-loop resident (known +13%)
run D3DP_BENCH_FUSE=5 D3DP_RES_UNROLL=1     # the compile gamble
run D3DP_BENCH_FUSE=4                       # drift check
echo "ALL CELLS DONE"
