#!/usr/bin/env bash
# Predict + evaluate a model over all six standard suites.
set -e
MODEL=${1:?model dir}
ROOT=${2:-places_standard_dataset}
OUT=${3:-paper_results}
for suite in random_thin_256 random_medium_256 random_thick_256 \
             random_thin_512 random_medium_512 random_thick_512; do
  python3 bin/predict.py model.path="$MODEL" \
    indir=${ROOT}/evaluation/${suite} outdir=${OUT}/${suite} dataset.img_suffix=.png
  python3 bin/evaluate_predicts.py configs/eval2.yaml \
    ${ROOT}/evaluation/${suite} ${OUT}/${suite} ${OUT}/${suite}_metrics.tsv
done
