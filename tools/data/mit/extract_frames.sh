#!/usr/bin/env bash
set -e
python tools/data/build_rawframes.py ${1:-data/mit/videos} ${2:-data/mit/rawframes} --level 1 --ext mp4
