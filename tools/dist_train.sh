#!/usr/bin/env bash
# Compatibility wrapper for the reference CLI (tools/dist_train.sh CONFIG
# NGPUS [args...]). JAX SPMD uses every visible device from ONE process —
# no torch.distributed.launch. NGPUS restricts the mesh width.
CONFIG=$1
GPUS=$2
shift 2
exec python "$(dirname "$0")/train.py" "$CONFIG" --num-devices "$GPUS" "$@"
