#!/usr/bin/env bash
set -e
# BSN/BMN-style TSN features (csv per video), as used by the
# localization configs. See the ActivityNet repo for the feature release;
# expected layout: data/ActivityNet/activitynet_feature_cuhk/csv_mean_100/*.csv
echo "Download the CUHK TSN feature release (see header)."
exit 1
