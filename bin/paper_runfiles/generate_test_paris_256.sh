#!/usr/bin/env bash
# Paris StreetView 256 test mask suites (reference generate_test_paris_256.sh).
set -e
source "$(dirname "$0")/env.sh"
PARIS_ROOT="${PARIS_ROOT:-/data/inpainting/Paris_StreetView_Dataset/paris_eval_gt}"
OUT_DIR="${OUT_DIR:-/data/inpainting/paper_data/Paris_StreetView_Dataset_val_256}"

for conf in random_thin_256 random_medium_256 random_thick_256; do
  python3 "$BINDIR/gen_mask_dataset_hydra.py" -cn "$conf" \
      indir="$PARIS_ROOT" outdir="$OUT_DIR/$conf" \
      ext=png
  python3 "$BINDIR/calc_dataset_stats.py" --samples-n 20 \
      "$OUT_DIR/$conf" "$OUT_DIR/${conf}_stats"
done
