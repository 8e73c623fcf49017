#!/usr/bin/env bash
# CelebA-HQ val/test mask suites (reference generate_test_celeba-hq.sh);
# no square crop — CelebA-HQ images are already square.
set -e
source "$(dirname "$0")/env.sh"
CELEBA_ROOT="${CELEBA_ROOT:-/data/inpainting/celeba-hq-dataset}"
OUT_DIR="${OUT_DIR:-/data/inpainting/paper_data/CelebA-HQ_val_test}"

for datadir in val test; do
  for conf in random_thin_256 random_medium_256 random_thick_256 \
              random_thin_512 random_medium_512 random_thick_512; do
    python3 "$BINDIR/gen_mask_dataset_hydra.py" -cn "$conf" \
        indir="$CELEBA_ROOT/${datadir}_256" \
        outdir="$OUT_DIR/$datadir/$conf" \
        cropping.out_square_crop=False
    python3 "$BINDIR/calc_dataset_stats.py" --samples-n 20 \
        "$OUT_DIR/$datadir/$conf" "$OUT_DIR/$datadir/${conf}_stats"
  done
done
