#!/usr/bin/env bash
# Build the full Places365 val/test mask suites of the paper protocol
# (reference bin/paper_runfiles/generate_val_test.sh; test_large_30k list
# comes from configs/test_large_30k.lst via fetch_data/eval_sampler.py).
set -e
source "$(dirname "$0")/env.sh"
PLACES_ROOT="${PLACES_ROOT:-/data/inpainting/Places365}"
OUT_DIR="${OUT_DIR:-/data/inpainting/paper_data/Places365_val_test}"

for datadir in test_large_30k; do      # add val_large for the val suites
  for conf in random_thin_256 random_medium_256 random_thick_256 \
              random_thin_512 random_medium_512 random_thick_512; do
    python3 "$BINDIR/gen_mask_dataset.py" "$CONFIGDIR/data_gen/${conf}.yaml" \
        "$PLACES_ROOT/$datadir" "$OUT_DIR/$datadir/$conf" --n-jobs 8
    python3 "$BINDIR/calc_dataset_stats.py" --samples-n 20 \
        "$OUT_DIR/$datadir/$conf" "$OUT_DIR/$datadir/${conf}_stats"
  done
done
