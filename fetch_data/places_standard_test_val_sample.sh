#!/usr/bin/env bash
# Sample test (2000) + visual val (100) subsets — analogue of the reference
# places_standard_test_val_sample.sh.
set -e
ROOT=${1:-places_standard_dataset}
mkdir -p ${ROOT}/val/ ${ROOT}/visual_test/
python3 fetch_data/sampler.py --root ${ROOT}

while read -r f; do cp "$f" ${ROOT}/val/; done \
  < ${ROOT}/original/test_random_files.txt
while read -r f; do cp "$f" ${ROOT}/visual_test/; done \
  < ${ROOT}/original/val_random_files.txt
