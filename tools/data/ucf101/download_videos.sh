#!/usr/bin/env bash
set -e
DATA_DIR=${1:-data/ucf101/videos}
mkdir -p "$DATA_DIR"
wget -c https://www.crcv.ucf.edu/data/UCF101/UCF101.rar --no-check-certificate -P "$DATA_DIR"
unrar x "$DATA_DIR/UCF101.rar" "$DATA_DIR"
