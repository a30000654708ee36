#!/usr/bin/env bash
set -e
python tools/data/generate_filelist.py sthv2 \
  --anno-dir ${1:-data/sthv2/annotations} --src-dir ${2:-data/sthv2/rawframes} \
  --format rawframes --level 1 --out-dir ${3:-data/sthv2}
