#!/usr/bin/env bash
set -e
python tools/data/build_rawframes.py ${1:-data/jester/videos} ${2:-data/jester/rawframes} --level 1 --ext mp4
