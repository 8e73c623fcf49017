#!/usr/bin/env bash
# FFHQ test mask suites (reference generate_test_ffhq.sh).
set -e
source "$(dirname "$0")/env.sh"
FFHQ_ROOT="${FFHQ_ROOT:-/data/inpainting/ffhq-dataset/images1024x1024}"
OUT_DIR="${OUT_DIR:-/data/inpainting/paper_data/FFHQ_val}"

for conf in random_thin_256 random_medium_256 random_thick_256 \
            random_thin_512 random_medium_512 random_thick_512; do
  python3 "$BINDIR/gen_mask_dataset_hydra.py" -cn "$conf" \
      indir="$FFHQ_ROOT" outdir="$OUT_DIR/$conf" \
      cropping.out_square_crop=False
  python3 "$BINDIR/calc_dataset_stats.py" --samples-n 20 \
      "$OUT_DIR/$conf" "$OUT_DIR/${conf}_stats"
done
