#!/usr/bin/env bash
# Parity: reference tools/test.sh — example fine-tuned-checkpoint
# evaluation with accuracy metrics + prediction dump.
CFG=${CFG:-configs/recognition/ssl_test/test_ssv2_r18.py}
CKPT=${CKPT:-work_dirs/test_ssv2_r18/latest.ckpt}
python "$(dirname "$0")/test.py" "$CFG" "$CKPT" \
    --metrics top_k_accuracy mean_class_accuracy \
    --out "${OUT:-results.json}" "$@"
