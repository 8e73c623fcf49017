#!/usr/bin/env bash
# step 2/3: inpaint the eval set
set -e
MODEL=${1:?model dir}
INDIR=${2:?eval set dir}
OUTDIR=${3:?predictions dir}
python3 bin/predict.py model.path="$MODEL" indir="$INDIR" outdir="$OUTDIR" dataset.img_suffix=.png
