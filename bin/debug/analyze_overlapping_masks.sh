#!/usr/bin/env bash
# Mask-overlap sensitivity pipeline (reference bin/debug/
# analyze_overlapping_masks.sh): generate debug masks over a sample of train
# images, predict, then mine good/bad samples + overlap sensitivity report.
set -e
BASEDIR="$(dirname "$0")"
SRC="${SRC:?set SRC to a directory of source images}"
WORK="${WORK:?set WORK to a working directory}"
MODEL_PATH="${MODEL_PATH:?set MODEL_PATH to a trained run dir}"

python3 "$BASEDIR/../gen_debug_mask_dataset.py" \
    "$BASEDIR/../../configs/debug_mask_gen.yaml" "$SRC" "$WORK/generated"
python3 "$BASEDIR/../predict.py" model.path="$MODEL_PATH" \
    indir="$WORK/generated" outdir="$WORK/predicted" dataset.img_suffix=.jpg
python3 "$BASEDIR/../analyze_errors.py" --only-report --n-jobs 8 \
    "$BASEDIR/../../configs/analyze_mask_errors.yaml" \
    "$WORK/generated" "$WORK/predicted" "$WORK/report"
