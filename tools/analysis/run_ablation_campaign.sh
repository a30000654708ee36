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
  # 1800s cap: a healthy full-scale arm takes ~8-12 min; the only runs
  # that ever exceeded ~25 min were backend-init hangs (tunnel stall or
  # device-release race with the previous process) that never recover.
  timeout 1800 python tools/analysis/ablation_ordering.py --arm "$arm" \
    --scale full --platform tpu --steps 400 --seed "$SEED" \
    >> "$LOG" 2>&1
  # Let the axon client fully release the device before the next
  # process attaches: a 5s gap produced one observed init deadlock.
  sleep 30
done
echo ALL_DONE >> "$LOG"
