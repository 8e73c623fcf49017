#!/usr/bin/env bash
# Build the Places2 512 eval suites used in the paper protocol.
set -e
ROOT=${1:-places_standard_dataset}
for suite in random_thin_512 random_medium_512 random_thick_512; do
  python3 bin/gen_mask_dataset.py configs/data_gen/${suite}.yaml \
    ${ROOT}/evaluation/hires ${ROOT}/evaluation/${suite}/
done
