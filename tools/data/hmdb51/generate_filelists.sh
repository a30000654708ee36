#!/usr/bin/env bash
set -e
python tools/data/generate_filelist.py hmdb51 \
  --anno-dir ${1:-data/hmdb51/annotations} --src-dir ${2:-data/hmdb51/rawframes} \
  --format rawframes --level 2 --out-dir ${3:-data/hmdb51}
