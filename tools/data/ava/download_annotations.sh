#!/usr/bin/env bash
set -e
DATA_DIR=${1:-data/ava/annotations}
VERSION=${2:-2.1}
mkdir -p "$DATA_DIR"
wget -c https://research.google.com/ava/download/ava_v${VERSION}.zip -P "$DATA_DIR"
unzip -o "$DATA_DIR/ava_v${VERSION}.zip" -d "$DATA_DIR"
