#!/bin/bash
# Self-probing TPU campaign (r3). SUPERSEDED by scripts/r4_campaign.sh,
# which runs the whole chain in ONE process; kept for the per-cell recipe.
# Launch via a pty wrapper (the tunnel needs a controlling TTY):
#   nohup script -qec "bash scripts/r3_auto_campaign.sh" /dev/null > /tmp/r3_auto.log 2>&1 &
set -u -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

# run-unique sentinel: the follow-up gates on THIS run's completion marker,
# not a stale one from a previous campaign
date +%s > /tmp/r3_auto.start

probe() {
  timeout 90 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); s=float(jnp.sum(jnp.ones((1024,1024))))
el=time.time()-t0
print(f'probe {el:.2f}s'); raise SystemExit(0 if el < 20 else 1)"
}
wait_healthy() { until probe; do echo "DEGRADED $(date)"; sleep 420; done; }

wait_healthy
echo "HEALTHY $(date) — starting cells"

run() {
  echo "== $* =="
  env "$@" timeout 1800 python scripts/fwd_bench.py > /tmp/r3_cell.out 2>&1
  rc=$?
  tail -1 /tmp/r3_cell.out
  echo "rc=$rc"
}

# hmqkv paired cells (control A / variants / control B in one window)
run D3DP_DUMMY=                        # default control A (batched T, loop S)
run D3DP_ATTN_VARIANT_T=hmqkv          # head-major temporal only
run D3DP_ATTN_VARIANT_S=hmqkv          # head-major spatial only
run D3DP_ATTN_VARIANT=hmqkv            # head-major both stages
run D3DP_DUMMY=                        # default control B (drift check)

# re-probe between cell groups: the tunnel degrades over hours
wait_healthy

# open tb cells from the r2/r3 sweeps
run D3DP_ATTN_VARIANT_T=loop D3DP_TB_ATTN_T=20   # ambiguous 126.2 cell re-run
run D3DP_TB_ATTN_T=2                             # batched finer tb sweep
run D3DP_TB_ATTN_T=4
run D3DP_DUMMY=                        # default control C (drift check)
date +%s > /tmp/r3_auto.done
echo "ALL CELLS DONE $(date)"
