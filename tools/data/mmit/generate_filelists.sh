#!/usr/bin/env bash
set -e
python tools/data/generate_filelist.py mmit \
  --anno-dir ${1:-data/mmit/annotations} --src-dir ${2:-data/mmit/rawframes} \
  --format rawframes --level 1 --out-dir ${3:-data/mmit}
