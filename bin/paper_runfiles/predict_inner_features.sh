#!/usr/bin/env bash
# Dump inner-activation heatmaps for the paper figures
# (reference predict_inner_features.sh).
set -e
source "$(dirname "$0")/env.sh"
MODEL_PATH="${MODEL_PATH:?set MODEL_PATH to a trained run dir}"
INDIR="${INDIR:?set INDIR}"
OUTDIR="${OUTDIR:?set OUTDIR}"

python3 "$BINDIR/predict_inner_features.py" \
    model.path="$MODEL_PATH" indir="$INDIR" outdir="$OUTDIR" \
    dataset.img_suffix=.png
