#!/usr/bin/env bash
set -e
DATA_DIR=${1:-data/thumos14}
mkdir -p "$DATA_DIR/annotations" "$DATA_DIR/videos"
wget -c https://storage.googleapis.com/thumos14_files/TH14_Temporal_annotations_validation.zip -P "$DATA_DIR/annotations"
wget -c https://storage.googleapis.com/thumos14_files/TH14_Temporal_annotations_test.zip -P "$DATA_DIR/annotations"
wget -c https://storage.googleapis.com/thumos14_files/TH14_validation_set_mp4.zip -P "$DATA_DIR/videos"
wget -c https://storage.googleapis.com/thumos14_files/TH14_Test_set_mp4.zip -P "$DATA_DIR/videos"
for f in "$DATA_DIR"/annotations/*.zip "$DATA_DIR"/videos/*.zip; do unzip -o "$f" -d "$(dirname "$f")"; done
