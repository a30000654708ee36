#!/usr/bin/env bash
set -e
python tools/data/generate_filelist.py diving48 \
  --anno-dir ${1:-data/diving48/annotations} --src-dir ${2:-data/diving48/rawframes} \
  --format rawframes --level 1 --out-dir ${3:-data/diving48}
