#!/usr/bin/env bash
set -e
DATA_DIR=${1:-data/ava/videos}
mkdir -p "$DATA_DIR"
wget -c https://s3.amazonaws.com/ava-dataset/annotations/ava_file_names_trainval_v2.1.txt -P "$DATA_DIR"
while read -r vid; do
  wget -c "https://s3.amazonaws.com/ava-dataset/trainval/$vid" -P "$DATA_DIR"
done < "$DATA_DIR/ava_file_names_trainval_v2.1.txt"
