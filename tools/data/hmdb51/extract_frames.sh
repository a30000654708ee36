#!/usr/bin/env bash
set -e
python tools/data/build_rawframes.py ${1:-data/hmdb51/videos} ${2:-data/hmdb51/rawframes} --level 2 --ext avi
