#!/usr/bin/env bash
# Generate val/visual_test masks — analogue of the reference
# places_standard_test_val_gen_masks.sh.
set -e
ROOT=${1:-places_standard_dataset}
mkdir -p ${ROOT}/val_masked ${ROOT}/visual_test_masked

python3 bin/gen_mask_dataset.py configs/data_gen/random_medium_512.yaml \
  ${ROOT}/val ${ROOT}/val_masked
python3 bin/gen_mask_dataset.py configs/data_gen/random_medium_512.yaml \
  ${ROOT}/visual_test ${ROOT}/visual_test_masked
