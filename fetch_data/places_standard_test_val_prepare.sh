#!/usr/bin/env bash
# Untar Places val/test splits — analogue of the reference script.
set -e
ROOT=${1:-places_standard_dataset}
mkdir -p ${ROOT}/original/test_large ${ROOT}/original/val_large
tar -xvf test_large.tar -C ${ROOT}/original/
tar -xvf val_large.tar -C ${ROOT}/original/
mv ${ROOT}/original/test_large ${ROOT}/original/test || true
mv ${ROOT}/original/val_large ${ROOT}/original/val || true
