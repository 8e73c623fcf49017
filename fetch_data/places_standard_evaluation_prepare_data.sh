#!/usr/bin/env bash
# Build the 6 standard evaluation suites (thin/medium/thick x 256/512) from a
# prepared Places dataset — analogue of the reference script of the same name.
set -e

ROOT=${1:-places_standard_dataset}

mkdir -p ${ROOT}/evaluation/hires/
for suite in random_thick_512 random_thin_512 random_medium_512 \
             random_thick_256 random_thin_256 random_medium_256; do
  mkdir -p ${ROOT}/evaluation/${suite}/
done

# 1. sample 30000 eval images
python3 fetch_data/eval_sampler.py --root ${ROOT}

while read -r f; do
  cp "$f" ${ROOT}/evaluation/hires/
done < ${ROOT}/original/eval_random_files.txt

# 2. generate all mask suites
for suite in random_thick_512 random_thin_512 random_medium_512 \
             random_thick_256 random_thin_256 random_medium_256; do
  python3 bin/gen_mask_dataset.py \
    configs/data_gen/${suite}.yaml \
    ${ROOT}/evaluation/hires \
    ${ROOT}/evaluation/${suite}/
done
