#!/usr/bin/env bash
set -e
DATASET=${1:-kinetics400}
DATA_DIR=data/${DATASET}/annotations
mkdir -p "$DATA_DIR"
V=${DATASET#kinetics}
wget -c https://s3.amazonaws.com/kinetics/${V}/annotations/train.csv -O "$DATA_DIR/${DATASET}_train.csv"
wget -c https://s3.amazonaws.com/kinetics/${V}/annotations/val.csv   -O "$DATA_DIR/${DATASET}_val.csv"
wget -c https://s3.amazonaws.com/kinetics/${V}/annotations/test.csv  -O "$DATA_DIR/${DATASET}_test.csv" || true
