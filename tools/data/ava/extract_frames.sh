#!/usr/bin/env bash
set -e
# AVA uses 1-fps keyframe-centered clips at 30fps raw frames
python tools/data/build_rawframes.py ${1:-data/ava/videos} ${2:-data/ava/rawframes} --level 1 --ext mp4 --fps 30
