#!/bin/bash
# Round-5 serialized TPU campaign — closes the r4 verdict's evidence holes:
#
#   trainlab   — batch-scaling curve B=4/8/16/32 (verdict item 1; the B=32
#                cell failed with env flakes in r3+r4 — retried here)
#   qbf16_*    — bf16-Pallas training arm: flagship config on structured
#                synthetic, 120 epochs in THREE stages with `-r auto`
#                (2 genuine resume cycles = the soak evidence, item 6),
#                orbax async checkpoints, per-epoch validation
#   qfp32      — identical fp32-XLA arm (same data/seed/batch order)
#   abgate     — final-eval A/B across all 4 modes at H=20 K=10 under one
#                fixed bf16 eval config (item 2's convergence gate)
#   reuseK10/20— DDIM-reuse grid on the CONVERGED bf16 checkpoint (item 5)
#   fwdprofile — per-op forward profile at fuse-4 (item 7)
#   bench      — canonical bench (now also reports evaluator sequences/s
#                with p2 off/host/device — items 3+4)
#
#   nohup script -qec "bash scripts/r5_campaign.sh" /dev/null > /tmp/r5.log 2>&1 &
set -u -o pipefail
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
cd "$SCRIPT_DIR/.."
CELL_PREFIX=r5
source "$SCRIPT_DIR/campaign_common.sh"

CKPTS="$HOME/.cache/d3dp_tpu/ckpts"
QB="$CKPTS/r5_bf16"
QF="$CKPTS/r5_fp32"
mkdir -p "$QB" "$QF"

# One training config for both arms; only --dtype differs. 3 train subjects
# x 24300 frames = 300 chunks (x2 flip augment) -> 150 steps/epoch at
# b=972; -lrd 0.98 anneals a 120-epoch schedule the way the reference's
# 0.993 anneals 400. --eval-batch-size 4 keeps the per-epoch validator on
# 4-window micro-batches (the train -b is in frames, not windows).
TRAIN_FLAGS="-d synthetic -k structured -str S1,S5,S6 -ste S9
  -f 243 -cs 512 -dep 8 -b 972 -s 243 --synthetic-frames 24300 --seed 1
  -lrd 0.98 -cf 10 --eval-batch-size 4 --nolog"

echo "CAMPAIGN START $(date)"

# ---- group 1: batch-scaling curve ----
wait_healthy
run trainlab timeout 4800 python scripts/train_lab.py --dpr 0.1 --batches 4 8 16 32

# ---- group 2: bf16 arm (3 stages -> 2 resume cycles; orbax async) ----
wait_healthy
run qbf16_a timeout 7200 python main.py $TRAIN_FLAGS --dtype bfloat16 \
  --ckpt-format orbax -c "$QB" -e 40 -r auto
wait_healthy
run qbf16_b timeout 7200 python main.py $TRAIN_FLAGS --dtype bfloat16 \
  --ckpt-format orbax -c "$QB" -e 80 -r auto
# mid-soak H=20 K=10 eval on the best-so-far checkpoint (soak's periodic
# full eval; also exercises orbax load through the eval path)
run qbf16_mideval timeout 7200 python main.py $TRAIN_FLAGS --dtype bfloat16 \
  -c "$QB" --evaluate best_epoch.orbax -num_proposals 20 -sampling_timesteps 10
wait_healthy
run qbf16_c timeout 7200 python main.py $TRAIN_FLAGS --dtype bfloat16 \
  --ckpt-format orbax -c "$QB" -e 120 -r auto

# ---- group 3: fp32 arm (resumable across degraded windows) ----
for attempt in 1 2 3 4; do
  if [ -e "$QF/epoch_120.ckpt" ]; then break; fi
  wait_healthy
  run qfp32_$attempt timeout 10800 python main.py $TRAIN_FLAGS --dtype float32 \
    -c "$QF" -e 120 -r auto
done
ls "$QF" || true

# ---- group 4: convergence gate ----
wait_healthy
run abgate timeout 7200 python scripts/ab_gate.py \
  --ckpt-fp32 "$QF" --ckpt-bf16 "$QB" --out /tmp/r5_ab_gate.json

# ---- group 5: reuse grids on the converged bf16 checkpoint ----
wait_healthy
run reuseK10 timeout 7200 python scripts/quantify_reuse.py \
  --ckpt "$QB/best_epoch.orbax" --proposals 20 --steps 10 \
  --out /tmp/r5_reuse_K10.json
wait_healthy
run reuseK20 timeout 7200 python scripts/quantify_reuse.py \
  --ckpt "$QB/best_epoch.orbax" --proposals 20 --steps 20 \
  --out /tmp/r5_reuse_K20.json

# ---- group 6: per-op forward profile at fuse-4 ----
wait_healthy
run fwdprofile timeout 3600 python scripts/fwd_profile.py

# ---- group 7: canonical bench (primary + train + eval-e2e cells) ----
wait_healthy
run bench timeout 7200 python bench.py
echo "CAMPAIGN DONE $(date)"
