#!/usr/bin/env bash
set -e
DATASET=${1:-kinetics400}
python tools/data/build_rawframes.py data/${DATASET}/videos_train data/${DATASET}/rawframes_train --level 2 --ext mp4
python tools/data/build_rawframes.py data/${DATASET}/videos_val data/${DATASET}/rawframes_val --level 2 --ext mp4
