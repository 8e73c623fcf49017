#!/usr/bin/env bash
# Generate the thin/medium/thick 256px eval mask suites for both CelebA-HQ
# splits (val + visual_test). Run from the repo root after
# celebahq_dataset_prepare.sh.
set -e

for split in val visual_test; do
    for suite in thick thin medium; do
        python3 bin/gen_mask_dataset.py \
            "$(pwd)/configs/data_gen/random_${suite}_256.yaml" \
            "celeba-hq-dataset/${split}_source_256/" \
            "celeba-hq-dataset/${split}_256/random_${suite}_256/"
    done
done
