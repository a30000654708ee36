#!/usr/bin/env bash
set -e
DATA_DIR=${1:-data/hmdb51/annotations}
mkdir -p "$DATA_DIR"
wget -c https://serre-lab.clps.brown.edu/wp-content/uploads/2013/10/test_train_splits.rar --no-check-certificate -P "$DATA_DIR"
unrar x "$DATA_DIR/test_train_splits.rar" "$DATA_DIR"
mv "$DATA_DIR"/testTrainMulti_7030_splits/* "$DATA_DIR" && rmdir "$DATA_DIR/testTrainMulti_7030_splits"
