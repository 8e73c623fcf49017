#!/usr/bin/env bash
# Recompute mask-area / EDT statistics for already-generated eval suites
# (reference update_test_data_stats.sh).
set -e
source "$(dirname "$0")/env.sh"
INDIR="${INDIR:-/data/inpainting/paper_data/CelebA-HQ_val_test/test}"

for dataset in random_thin_256 random_medium_256 random_thick_256; do
  python3 "$BINDIR/calc_dataset_stats.py" \
      "$INDIR/$dataset" "$INDIR/${dataset}_stats2"
done
