#!/bin/bash
# Round-5b follow-up: DDIM-reuse quantification at LOW absolute error.
#
# The r5 converged generalization-regime checkpoint floors at ~220 mm
# P-Best (H=20 K=10) — the structured-synthetic task's depth-ambiguity
# floor, not undertraining (loss plateaued, lr annealed). To also measure
# reuse deltas in a genuinely low-mm regime, this campaign trains an
# OVERFIT probe (train subject == eval subject, pure memorization drives
# eval error far below the task floor) and reruns the K=20 H=20 grid on
# it. Reuse deltas that stay sub-mm in BOTH regimes support the
# "accuracy-neutral" claim; growth in either kills it.
#
# Run AFTER r5_campaign.sh finishes (one process holds the chip):
#   nohup script -qec "bash scripts/r5b_campaign.sh" /dev/null > /tmp/r5b.log 2>&1 &
set -u -o pipefail
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
cd "$SCRIPT_DIR/.."
CELL_PREFIX=r5b
source "$SCRIPT_DIR/campaign_common.sh"

QO="$HOME/.cache/d3dp_tpu/ckpts/r5_overfit"
mkdir -p "$QO"

# S9->S9: same sequences train and eval (memorization probe). Same seed,
# schedule and dims as the r5 arms; quantify_reuse's own eval set uses
# --synthetic-frames 4860, so train S9 on 4860 frames to make the
# memorized sequences THE reuse-eval sequences.
OVERFIT_FLAGS="-d synthetic -k structured -str S9 -ste S9
  -f 243 -cs 512 -dep 8 -b 972 -s 243 --synthetic-frames 4860 --seed 1
  -lrd 0.98 -cf 10 --eval-batch-size 4 --nolog --dtype bfloat16
  --ckpt-format orbax -c $QO"

echo "CAMPAIGN START $(date)"
for attempt in 1 2 3; do
  if [ -e "$QO/epoch_150.orbax" ]; then break; fi
  wait_healthy
  run overfit_$attempt timeout 7200 python main.py $OVERFIT_FLAGS -e 150 -r auto
done
ls "$QO" || true

wait_healthy
run reuse_overfit_K20 timeout 7200 python scripts/quantify_reuse.py \
  --ckpt "$QO/best_epoch.orbax" --proposals 20 --steps 20 \
  --out /tmp/r5_reuse_overfit_K20.json

# ---- A/B gate adjudication (the J_Best +2.0mm cell) -----------------
# The r5 gate failed ONLY J_Best (+1.97mm vs 1.36 tol; the deployed
# J_Agg was BETTER under bf16 by 0.6mm). J_Best is a per-joint oracle
# min over 20 hypotheses — a tail statistic. Two noise baselines decide
# whether +2mm is systematic or run noise:
#   keyB/keyC  — same checkpoints, different DDIM eval keys (sampling
#                noise component)
#   fp32drift  — fp32 epoch_110 vs fp32 epoch_120 (SAME arm, adjacent
#                checkpoints: weight-trajectory noise on the statistic;
#                the JSON's fp32/bf16 labels here mean e110/e120)
QF="$HOME/.cache/d3dp_tpu/ckpts/r5_fp32"
QB="$HOME/.cache/d3dp_tpu/ckpts/r5_bf16"
wait_healthy
run abgate_keyB timeout 7200 python scripts/ab_gate.py \
  --ckpt-fp32 "$QF" --ckpt-bf16 "$QB" --key 101 \
  --out /tmp/r5_ab_gate_keyB.json
run abgate_keyC timeout 7200 python scripts/ab_gate.py \
  --ckpt-fp32 "$QF" --ckpt-bf16 "$QB" --key 202 \
  --out /tmp/r5_ab_gate_keyC.json
wait_healthy
run fp32drift timeout 7200 python scripts/ab_gate.py \
  --ckpt-fp32 "$QF/epoch_110.ckpt" --ckpt-bf16 "$QF/epoch_120.ckpt" \
  --out /tmp/r5_ab_gate_fp32drift.json
echo "CAMPAIGN DONE $(date)"
