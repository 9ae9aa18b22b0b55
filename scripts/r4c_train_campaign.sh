#!/bin/bash
# Round-4c serialized TPU campaign: measure the r4 DropPath-fused training
# path (per-row-scale dp kernels) + the backward compute-dtype fix.
#
# Cells (paired in one window, composed-path controls interleaved):
#   ctl   — D3DP_DP_FUSED=0: the pre-r4 composed train path (the baseline
#           55.1 ms/step from the r4b control)
#   dpf   — dp-fused path at the reference train config (dpr=0.1)
#   dpr00 — fused path without DropPath (bwd-dtype fix effect vs the r4b
#           74.1 ms cell that measured the fp32-einsum backward)
#   bench — canonical bench refresh (its train metric now takes the
#           dp-fused path)
#
#   nohup script -qec "bash scripts/r4c_train_campaign.sh" /dev/null > /tmp/r4c.log 2>&1 &
set -u -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

probe() {
  timeout 120 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); s=float(jnp.sum(jnp.ones((1024,1024))))
el=time.time()-t0
print(f'probe {el:.2f}s', flush=True); raise SystemExit(0 if el < 20 else 1)"
}
wait_healthy() {
  until probe; do echo "DEGRADED $(date) — sleeping"; sleep 420; done
  echo "HEALTHY $(date)"
}
run() {
  name="$1"; shift
  echo "== $name: $* =="
  env "$@" > "/tmp/r4c_cell_${name}.out" 2>&1
  rc=$?
  tail -1 "/tmp/r4c_cell_${name}.out"
  echo "rc=$rc ($name)"
}

echo "CAMPAIGN START $(date)"
wait_healthy
run ctlA  D3DP_DP_FUSED=0 timeout 2400 python scripts/train_lab.py --dpr 0.1 --batches 4 8
run dpf   timeout 2400 python scripts/train_lab.py --dpr 0.1 --batches 4 8 16
run dpr00 timeout 2400 python scripts/train_lab.py --dpr 0.0 --batches 4
run ctlB  D3DP_DP_FUSED=0 timeout 2400 python scripts/train_lab.py --dpr 0.1 --batches 4
wait_healthy
run bench timeout 3000 python bench.py
echo "CAMPAIGN DONE $(date)"
