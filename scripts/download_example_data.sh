#!/bin/sh
# Fetch the DS-NeRF fern_2v example scene (parity: download_example_data.sh).
# NOTE: zero-egress environments can't fetch; generate a synthetic scene
# instead with: python -m depth_lidar_nerf_tpu.data.make_synthetic ./train_data_synth
set -e
wget https://www.dropbox.com/s/agjz8xyqeb0onrj/fern_2v.zip
unzip fern_2v.zip -d data/
rm fern_2v.zip
