#!/usr/bin/env bash
set -e
python tools/data/generate_filelist.py ucf101 \
  --anno-dir ${1:-data/ucf101/annotations} --src-dir ${2:-data/ucf101/rawframes} \
  --format rawframes --level 2 --out-dir ${3:-data/ucf101}
