#!/usr/bin/env bash
# step 3/3: compute SSIM/LPIPS/FID with mask-area bins
set -e
INDIR=${1:?eval set dir}
PREDDIR=${2:?predictions dir}
OUT=${3:?metrics tsv path}
python3 bin/evaluate_predicts.py configs/eval2.yaml "$INDIR" "$PREDDIR" "$OUT"
