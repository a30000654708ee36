#!/usr/bin/env bash
set -e
python tools/data/build_rawframes.py ${1:-data/sthv1/videos} ${2:-data/sthv1/rawframes} --level 1 --ext mp4
