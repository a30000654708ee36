#!/usr/bin/env bash
set -e
DATASET=${1:-kinetics400}
python tools/data/generate_filelist.py ${DATASET} \
  --anno-dir data/${DATASET}/annotations --src-dir data/${DATASET}/rawframes_train \
  --format rawframes --level 2 --out-dir data/${DATASET}
