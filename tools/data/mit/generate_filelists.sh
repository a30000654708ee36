#!/usr/bin/env bash
set -e
python tools/data/generate_filelist.py mit \
  --anno-dir ${1:-data/mit/annotations} --src-dir ${2:-data/mit/rawframes} \
  --format rawframes --level 1 --out-dir ${3:-data/mit}
