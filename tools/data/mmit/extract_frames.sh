#!/usr/bin/env bash
set -e
python tools/data/build_rawframes.py ${1:-data/mmit/videos} ${2:-data/mmit/rawframes} --level 1 --ext mp4
