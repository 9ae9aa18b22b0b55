#!/bin/bash
# Round-4 serialized TPU campaign. ONE process holds the chip end-to-end
# (no marker-file coordination between processes — the r3 two-script chain
# was flagged for a stale-marker race; this supersedes it).
#
#   nohup script -qec "bash scripts/r4_campaign.sh" /dev/null > /tmp/r4_campaign.log 2>&1 &
#
# Order:
#   1. hmqkv paired forward cells (VERDICT r3 #2 — the unmeasured kernel)
#   2. open tb-sweep cells
#   3. train-step decomposition + batch-scaling lab (VERDICT r3 #3)
#   4. qualification retrain (structured-synthetic flagship; the r2/r3
#      checkpoint cache was wiped between rounds)
#   5. DDIM-reuse quantification at the reference headline config
#      H=20 K=10 (+ K=20) (VERDICT r3 #5)
#   6. canonical bench refresh
#
# Health discipline (CLAUDE.md): probe before each GROUP, not just once —
# the tunnel degrades over hours; a degraded window pauses the campaign.
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

# run CELLNAME [ENV=VAL ...] CMD ARGS...  — tee full output to a per-cell
# file, echo the last line + exit code (timeout -> rc=124) to the log
run() {
  name="$1"; shift
  echo "== $name: $* =="
  env "$@" > "/tmp/r4_cell_${name}.out" 2>&1
  rc=$?
  tail -1 "/tmp/r4_cell_${name}.out"
  echo "rc=$rc ($name)"
}

echo "CAMPAIGN START $(date)"

# ---- group 1: hmqkv paired cells (control A / variants / control B) ----
wait_healthy
run ctlA   timeout 1800 python scripts/fwd_bench.py
run hm_t   D3DP_ATTN_VARIANT_T=hmqkv timeout 1800 python scripts/fwd_bench.py
run hm_s   D3DP_ATTN_VARIANT_S=hmqkv timeout 1800 python scripts/fwd_bench.py
run hm_ts  D3DP_ATTN_VARIANT=hmqkv   timeout 1800 python scripts/fwd_bench.py
run ctlB   timeout 1800 python scripts/fwd_bench.py

# ---- group 2: open tb cells ----
wait_healthy
run tb20loop D3DP_ATTN_VARIANT_T=loop D3DP_TB_ATTN_T=20 timeout 1800 python scripts/fwd_bench.py
run tb2      D3DP_TB_ATTN_T=2 timeout 1800 python scripts/fwd_bench.py
run tb4      D3DP_TB_ATTN_T=4 timeout 1800 python scripts/fwd_bench.py
run ctlC     timeout 1800 python scripts/fwd_bench.py

# ---- group 3: train lab ----
wait_healthy
run trainlab timeout 4800 python scripts/train_lab.py

# ---- group 4: qualification retrain (resumable; loop until 25 epochs) ----
wait_healthy
mkdir -p ~/.cache/d3dp_tpu/ckpts/qual_fp32
for attempt in 1 2 3 4 5 6; do
  if [ -f ~/.cache/d3dp_tpu/ckpts/qual_fp32/epoch_25.ckpt ]; then break; fi
  run qualtrain_$attempt timeout 5400 python main.py -d synthetic -k structured \
    -e 25 -cf 5 -f 243 -cs 512 -dep 8 -b 972 -s 243 --synthetic-frames 4860 \
    --seed 1 --nolog -c ~/.cache/d3dp_tpu/ckpts/qual_fp32 -r auto --no_eval
  wait_healthy
done
ls ~/.cache/d3dp_tpu/ckpts/qual_fp32/ || true

# ---- group 5: reuse quantification at the headline config ----
wait_healthy
run reuseK10 timeout 5400 python scripts/quantify_reuse.py \
  --proposals 20 --steps 10 --out /tmp/reuse_quant_H20K10.json
wait_healthy
run reuseK20 timeout 5400 python scripts/quantify_reuse.py \
  --proposals 20 --steps 20 --out /tmp/reuse_quant_H20K20.json

# ---- group 6: canonical bench ----
wait_healthy
run bench timeout 1800 python bench.py

echo "CAMPAIGN DONE $(date)"

# ---- group 7 (appended while groups 1-2 ran): custom-VJP backward lab ----
wait_healthy
run bwdlab timeout 2400 python scripts/train_bwd_lab.py

echo "CAMPAIGN DONE+BWD $(date)"

# ---- group 8 (appended): reuse quantification WITH the final-step-refresh
# schedule fix (d3dp.py reuse_schedule) — K10 re-run + canonical K5 ----
wait_healthy
run reuseK10fix timeout 5400 python scripts/quantify_reuse.py \
  --proposals 20 --steps 10 --out /tmp/reuse_quant_H20K10_fixed.json
wait_healthy
run reuseK5fix timeout 5400 python scripts/quantify_reuse.py \
  --proposals 5 --steps 5 --out /tmp/reuse_quant_H5K5_fixed.json

echo "CAMPAIGN DONE+REUSEFIX $(date)"
