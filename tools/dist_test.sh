#!/usr/bin/env bash
# Compatibility wrapper (reference tools/dist_test.sh CONFIG CKPT NGPUS).
CONFIG=$1
CKPT=$2
GPUS=$3
shift 3
exec python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" --num-devices "$GPUS" "$@"
