#!/usr/bin/env bash
set -e
python tools/data/generate_filelist.py sthv1 \
  --anno-dir ${1:-data/sthv1/annotations} --src-dir ${2:-data/sthv1/rawframes} \
  --format rawframes --level 1 --out-dir ${3:-data/sthv1}
