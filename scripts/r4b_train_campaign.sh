#!/bin/bash
# Round-4b serialized TPU campaign: the train-forward DropPath diagnostic.
#
# Hypothesis (from Block.__call__'s fused-path gate, models/mixste.py): with
# drop_path_rate=0.1 (the reference training config) blocks 1..7 route
# through the COMPOSED kernel path in training, so the train forward never
# gets the fused stage kernels the sampler runs on. dpr=0 engages them —
# the paired delta measures what a DropPath-capable fused path would win.
#
#   nohup script -qec "bash scripts/r4b_train_campaign.sh" /dev/null > /tmp/r4b.log 2>&1 &
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
  env "$@" > "/tmp/r4b_cell_${name}.out" 2>&1
  rc=$?
  tail -1 "/tmp/r4b_cell_${name}.out"
  echo "rc=$rc ($name)"
}

echo "CAMPAIGN START $(date)"
wait_healthy
run dpr01_ctlA timeout 2400 python scripts/train_lab.py --dpr 0.1 --batches 4 8
run dpr00      timeout 2400 python scripts/train_lab.py --dpr 0.0 --batches 4 8
run dpr01_ctlB timeout 2400 python scripts/train_lab.py --dpr 0.1 --batches 4
wait_healthy
run b32retry   timeout 2400 python scripts/train_lab.py --dpr 0.1 --batches 32
wait_healthy
run bwdlab     timeout 2400 python scripts/train_bwd_lab.py
echo "CAMPAIGN DONE $(date)"
