#!/bin/bash
# The sweep cells whose Mosaic compiles exceeded the old 580 s foreground
# window (temporal tb=20, batched head-major tb=2/4). The pty wrapper
# lifts the ceiling — each cell gets a 45 min budget, one process per
# cell (trace-time env switches), paired defaults for drift checks:
#   nohup script -qec "bash scripts/r3_longcompile_cells.sh" /dev/null > /tmp/longcells.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

cell() { echo "== $* =="; env "$@" timeout 2700 python scripts/stage_lab.py "${ARGS[@]}" 2>&1 | tail -1; }

ARGS=(--stage temporal);        cell D3DP_DUMMY=            # control
ARGS=(--stage temporal --tb 20); cell D3DP_DUMMY=
ARGS=(--stage temporal --tb 2);  cell D3DP_ATTN_VARIANT=batched
ARGS=(--stage temporal --tb 4);  cell D3DP_ATTN_VARIANT=batched
ARGS=(--stage spatial);          cell D3DP_DUMMY=            # control
ARGS=(--stage spatial --tb 2);   cell D3DP_ATTN_VARIANT=batched
echo "ALL CELLS DONE"
