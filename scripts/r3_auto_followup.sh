#!/bin/bash
# Chained follow-up to scripts/r3_auto_campaign.sh. SUPERSEDED by
# scripts/r4_campaign.sh (single-process chain, no marker coordination).
# Gates on the campaign's run-unique /tmp/r3_auto.done timestamp being
# NEWER than this script's own start, so a stale marker from a previous
# campaign can never start a second TPU-holding process.
#   nohup script -qec "bash scripts/r3_auto_followup.sh" /dev/null > /tmp/r3_followup.log 2>&1 &
set -u -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/d3dp_tpu/jax}"

START=$(date +%s)
until [ -f /tmp/r3_auto.done ] && [ "$(cat /tmp/r3_auto.done)" -ge "$START" ]; do
  sleep 120
done
echo "campaign done $(date) — starting follow-ups"

echo "== train_lab =="
timeout 3000 python scripts/train_lab.py 2>&1 | tail -8
echo "rc=$?"

echo "== bench =="
timeout 1800 python bench.py 2>&1 | tail -1
echo "rc=$?"
echo "FOLLOWUP DONE $(date)"
