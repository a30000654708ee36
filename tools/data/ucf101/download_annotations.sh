#!/usr/bin/env bash
set -e
DATA_DIR=${1:-data/ucf101/annotations}
mkdir -p "$DATA_DIR"
wget -c https://www.crcv.ucf.edu/data/UCF101/UCF101TrainTestSplits-RecognitionTask.zip --no-check-certificate -P "$DATA_DIR"
unzip -o "$DATA_DIR/UCF101TrainTestSplits-RecognitionTask.zip" -d "$DATA_DIR"
mv "$DATA_DIR"/ucfTrainTestlist/* "$DATA_DIR" && rmdir "$DATA_DIR/ucfTrainTestlist"
