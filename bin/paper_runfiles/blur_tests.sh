#!/usr/bin/env bash
# Gaussian-blur baseline over predictions + evaluation
# (reference blur_tests.sh).
set -e
source "$(dirname "$0")/env.sh"
IN_DIR="${IN_DIR:?set IN_DIR to the eval dataset dir}"
PRED_DIR="${PRED_DIR:?set PRED_DIR to the predictions dir}"
OUT_DIR="${OUT_DIR:?set OUT_DIR for blurred predictions}"
EVAL_OUT="${EVAL_OUT:-$OUT_DIR/metrics}"

python3 "$BINDIR/blur_predicts.py" "$CONFIGDIR/eval2.yaml" \
    "$IN_DIR" "$PRED_DIR" "$OUT_DIR"
python3 "$BINDIR/evaluate_predicts.py" "$CONFIGDIR/eval2.yaml" \
    "$IN_DIR" "$OUT_DIR" "$EVAL_OUT.tsv"
