#!/bin/bash
# Round-4c serialized TPU campaign: measure the r4 DropPath-fused training
# path (per-row-scale dp kernels) + the backward compute-dtype fix.
#
# HISTORY: this campaign originally ran pre-commit-5f07f3c, when the fused
# stage kernels were the training DEFAULT and D3DP_DP_FUSED=0 selected the
# composed control. 5f07f3c inverted the default (training composes;
# D3DP_TRAIN_FUSED=1 opts into the fused kernels), so the cells below are
# expressed in the HEAD env var: ctl cells run the (now-default) composed
# path, dpf/dpr00 opt into the fused path. Results (r4c, recorded in
# PERFORMANCE.md "r4c: DropPath-fused training path"): composed 54.1
# ms/step vs fused 74.2 — fused LOSES in training; it stays eval-only.
#
# Cells (paired in one window, composed-path controls interleaved):
#   ctl   — composed train path (the 55.1 ms/step r4b control; HEAD default)
#   dpf   — D3DP_TRAIN_FUSED=1 fused path at the reference config (dpr=0.1)
#   dpr00 — fused path without DropPath (bwd-dtype fix effect vs the r4b
#           74.1 ms cell that measured the fp32-einsum backward)
#   bench — canonical bench refresh
#
#   nohup script -qec "bash scripts/r4c_train_campaign.sh" /dev/null > /tmp/r4c.log 2>&1 &
set -u -o pipefail
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
cd "$SCRIPT_DIR/.."
CELL_PREFIX=r4c
source "$SCRIPT_DIR/campaign_common.sh"

echo "CAMPAIGN START $(date)"
wait_healthy
run ctlA  timeout 2400 python scripts/train_lab.py --dpr 0.1 --batches 4 8
run dpf   D3DP_TRAIN_FUSED=1 timeout 2400 python scripts/train_lab.py --dpr 0.1 --batches 4 8 16
run dpr00 D3DP_TRAIN_FUSED=1 timeout 2400 python scripts/train_lab.py --dpr 0.0 --batches 4
run ctlB  timeout 2400 python scripts/train_lab.py --dpr 0.1 --batches 4
wait_healthy
# 7200: bench now also runs the eval-e2e cells (3 evaluator compiles) and
# may wait out up to ~16 min of degraded probes before measuring
run bench timeout 7200 python bench.py
echo "CAMPAIGN DONE $(date)"
