#!/usr/bin/env bash
set -e
# videos -> rawframes (level-2 class dirs)
python tools/data/build_rawframes.py ${1:-data/ucf101/videos} ${2:-data/ucf101/rawframes} --level 2 --ext avi
