#!/usr/bin/env bash
set -e
DATA_DIR=${1:-data/ActivityNet/annotations}
mkdir -p "$DATA_DIR"
wget -c http://ec2-52-25-205-214.us-west-2.compute.amazonaws.com/files/activity_net.v1-3.min.json -P "$DATA_DIR" || \
  wget -c https://download.openmmlab.com/mmaction/localization/anet_anno_action.json -P "$DATA_DIR"
