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
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
cd "$SCRIPT_DIR/.."
CELL_PREFIX=r4b
source "$SCRIPT_DIR/campaign_common.sh"

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
