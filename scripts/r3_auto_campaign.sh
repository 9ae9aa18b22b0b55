#!/bin/bash
# Self-probing TPU campaign: waits for a healthy tunnel window, then runs
# (1) the hmqkv paired forward cells, (2) the two open tb-sweep cells.
# Launch via a pty wrapper (the tunnel needs a controlling TTY):
#   nohup script -qec "bash scripts/r3_auto_campaign.sh" /dev/null > /tmp/r3_auto.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

probe() {
  timeout 90 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); s=float(jnp.sum(jnp.ones((1024,1024))))
el=time.time()-t0
print(f'probe {el:.2f}s'); raise SystemExit(0 if el < 20 else 1)"
}

until probe; do echo "DEGRADED $(date)"; sleep 420; done
echo "HEALTHY $(date) — starting cells"

run() { echo "== $* =="; env "$@" timeout 1800 python scripts/fwd_bench.py 2>&1 | tail -1; }

# hmqkv paired cells (control A / variants / control B in one window)
run D3DP_DUMMY=                        # default control A (batched T, loop S)
run D3DP_ATTN_VARIANT_T=hmqkv          # head-major temporal only
run D3DP_ATTN_VARIANT_S=hmqkv          # head-major spatial only
run D3DP_ATTN_VARIANT=hmqkv            # head-major both stages
run D3DP_DUMMY=                        # default control B (drift check)

# open tb cells from the r2/r3 sweeps
run D3DP_ATTN_VARIANT_T=loop D3DP_TB_ATTN_T=20   # ambiguous 126.2 cell re-run
run D3DP_TB_ATTN_T=2                             # batched finer tb sweep
run D3DP_TB_ATTN_T=4
run D3DP_DUMMY=                        # default control C (drift check)
echo "ALL CELLS DONE $(date)"
