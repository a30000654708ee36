#!/usr/bin/env bash
# Parity: reference tools/train.sh — the example pretrain invocation
# (reference README.md:20-24 geometry: 4 devices, validate,
# deterministic seed).
bash "$(dirname "$0")/dist_train.sh" \
    configs/recognition/moco/mscl_r18_cosm_lr2e-2.py 4 \
    --validate --seed 0 --deterministic "$@"
