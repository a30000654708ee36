#!/usr/bin/env bash
set -e
DATA_DIR=${1:-data/hmdb51/videos}
mkdir -p "$DATA_DIR"
wget -c https://serre-lab.clps.brown.edu/wp-content/uploads/2013/10/hmdb51_org.rar --no-check-certificate -P "$DATA_DIR"
unrar x "$DATA_DIR/hmdb51_org.rar" "$DATA_DIR"
for f in "$DATA_DIR"/*.rar; do [ "$f" = "$DATA_DIR/hmdb51_org.rar" ] || unrar x "$f" "$DATA_DIR"; done
