#!/usr/bin/env bash
# Parity: reference tools/misc/dist_clip_feature_extraction.sh.
# JAX is single-process multi-device on one host, so "distributed"
# extraction is just the CLI with a device count; for multi-host runs
# launch one task per host (see tools/slurm_test.sh) — each process
# joins the jax.distributed mesh automatically.
CONFIG=$1
CHECKPOINT=$2
DEVICES=$3

PYTHONPATH="$(dirname $0)/../..":$PYTHONPATH \
python "$(dirname "$0")/clip_feature_extraction.py" "$CONFIG" "$CHECKPOINT" \
    --num-devices "$DEVICES" "${@:4}"
