#!/bin/bash
# Chained follow-up to scripts/r3_auto_campaign.sh: waits for its
# "ALL CELLS DONE" marker (so exactly one process holds the chip), then
# runs the train-lab batch sweep (the B=32 cell flaked in the first r3
# attempt) and refreshes the canonical bench line.
#   nohup script -qec "bash scripts/r3_auto_followup.sh" /dev/null > /tmp/r3_followup.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

until grep -q "ALL CELLS DONE" /tmp/r3_auto.log 2>/dev/null; do sleep 120; done
echo "campaign done $(date) — starting follow-ups"

echo "== train_lab =="
timeout 3000 python scripts/train_lab.py 2>&1 | tail -8

echo "== bench =="
timeout 1800 python bench.py 2>&1 | tail -1
echo "FOLLOWUP DONE $(date)"
