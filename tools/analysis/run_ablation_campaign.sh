#!/bin/bash
# Ablation-ordering campaign: one seed, all five arms, sequentially on
# the (exclusive) TPU. Usage:
#   nohup tools/analysis/run_ablation_campaign.sh <seed> [arms...] &
# Writes docs/evidence/ablation/{arm}_full_s<seed>.json per arm and a
# campaign_s<seed>.log transcript; aggregate with ablation_summary.py.
# Arms are ordered so the paper's core comparison (MSCL vs MoCo vs
# MoDist) completes first if the run is cut short.
set -u
cd "$(dirname "$0")/../.."
SEED=${1:?seed}
shift || true
ARMS=${@:-"mscl moco modist mscl_nofra mscl_nomds"}
LOG=docs/evidence/ablation/campaign_s${SEED}.log
for arm in $ARMS; do
  echo "=== $arm $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 3600 python tools/analysis/ablation_ordering.py --arm "$arm" \
    --scale full --platform tpu --steps 400 --seed "$SEED" \
    >> "$LOG" 2>&1
done
echo ALL_DONE >> "$LOG"
