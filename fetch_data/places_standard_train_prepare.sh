#!/usr/bin/env bash
# Prepare Places365-Standard training data — analogue of the reference
# places_standard_train_prepare.sh: untar the downloaded archive and emit a
# location config pointing at it. (This environment has no egress; download
# http://data.csail.mit.edu/places/places365/train_large_places365standard.tar
# elsewhere and place it next to this script.)
set -e

ROOT=${1:-places_standard_dataset}

mkdir -p ${ROOT}/original/train/
tar -xvf train_large_places365standard.tar -C ${ROOT}/original/train/

cat > configs/training/location/places_standard.yaml <<EOF
# @package _group_
data_root_dir: $(pwd)/${ROOT}/
out_root_dir: $(pwd)/experiments/
tb_dir: $(pwd)/tb_logs/
pretrained_models: \${env:TORCH_HOME}
EOF
echo "Wrote configs/training/location/places_standard.yaml"
