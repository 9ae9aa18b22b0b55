#!/bin/bash
# Round-5c: corrected low-error overfit probe for DDIM reuse.
#
# The r5b probe was step-starved: 4860 frames -> 10 steps/epoch, so 150
# epochs = 1500 steps with lr already annealed away (the r5 arms took
# 18k steps to their 130 mm plateau); it landed ~350 mm and proves
# nothing about the low-error regime. Same memorization setup
# (train subject == quantify_reuse's eval subject and frame count), but
# a schedule that actually fits: 1200 epochs at -lrd 0.998 = 12k steps,
# lr annealed x0.09 by the end (~25 min at 1.2 s/epoch).
#
# Run AFTER r5b_campaign.sh finishes:
#   nohup script -qec "bash scripts/r5c_campaign.sh" /dev/null > /tmp/r5c.log 2>&1 &
set -u -o pipefail
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
cd "$SCRIPT_DIR/.."
CELL_PREFIX=r5c
source "$SCRIPT_DIR/campaign_common.sh"

QO2="$HOME/.cache/d3dp_tpu/ckpts/r5_overfit2"
mkdir -p "$QO2"

OVERFIT_FLAGS="-d synthetic -k structured -str S9 -ste S9
  -f 243 -cs 512 -dep 8 -b 972 -s 243 --synthetic-frames 4860 --seed 1
  -lrd 0.998 -cf 100 --eval-batch-size 4 --nolog --dtype bfloat16
  --ckpt-format orbax -c $QO2"

echo "CAMPAIGN START $(date)"
for attempt in 1 2 3; do
  if [ -e "$QO2/epoch_1200.orbax" ]; then break; fi
  wait_healthy
  run overfit2_$attempt timeout 7200 python main.py $OVERFIT_FLAGS -e 1200 -r auto
done
ls "$QO2" || true

wait_healthy
run reuse_low_K20 timeout 7200 python scripts/quantify_reuse.py \
  --ckpt "$QO2/best_epoch.orbax" --proposals 20 --steps 20 \
  --out /tmp/r5_reuse_lowerr_K20.json
echo "CAMPAIGN DONE $(date)"
