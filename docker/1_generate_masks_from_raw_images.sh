#!/usr/bin/env bash
# step 1/3: build an eval set from raw images (mirrors the reference pipeline)
set -e
CONFIG=${1:?data_gen config name, e.g. random_medium_512}
INDIR=${2:?input image dir}
OUTDIR=${3:?output dir}
python3 bin/gen_mask_dataset.py configs/data_gen/${CONFIG}.yaml "$INDIR" "$OUTDIR"
