#!/usr/bin/env bash
set -e
python tools/data/build_rawframes.py ${1:-data/diving48/videos} ${2:-data/diving48/rawframes} --level 1 --ext mp4
