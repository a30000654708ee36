#!/usr/bin/env bash
set -e
# Kinetics videos come from YouTube; use the official ActivityNet
# crawler (https://github.com/activitynet/ActivityNet) or the CVDF
# mirrors. Expected layout: data/<dataset>/videos_train/<class>/<id>_<start>_<end>.mp4
echo "See header comments: Kinetics requires the YouTube crawler / CVDF mirror."
exit 1
