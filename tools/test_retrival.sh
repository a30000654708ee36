#!/usr/bin/env bash
# Compatibility wrapper (reference tools/test_retrival.sh CONFIG CKPT);
# note the reference's spelling is kept for drop-in compatibility.
CONFIG=$1
CKPT=$2
shift 2
exec python "$(dirname "$0")/test_retrieval.py" "$CONFIG" "$CKPT" "$@"
