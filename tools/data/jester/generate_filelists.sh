#!/usr/bin/env bash
set -e
python tools/data/generate_filelist.py jester \
  --anno-dir ${1:-data/jester/annotations} --src-dir ${2:-data/jester/rawframes} \
  --format rawframes --level 1 --out-dir ${3:-data/jester}
