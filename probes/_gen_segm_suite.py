"""Generate an on-disk segm-backend mask suite and record its distribution
statistics (VERDICT r4 item 4).

Drives the REAL product pipeline — bin/gen_mask_dataset.py::process_images
with generator_kind='segmentation' (the SegmentationMask placement engine
over the ADE20kPanopticPredictor protocol) — across the synthetic-places
val images, then runs bin/mask_suite_stats.py on the result. The real
ADE20k weights are egress-blocked in this sandbox and random weights emit
arbitrary label maps that pass zero masks through the engine's filters
(documented in docs/MIGRATION.md), so the predictor here is a DETERMINISTIC
content-adaptive pseudo-segmenter: luminance terciles mapped to two ADE20k
'thing' classes + stuff background, instanced by connected components —
image-dependent object-shaped regions that exercise every engine constraint
(max_object_area, min_mask_area, intersection/coverage caps, rigid
placement, flips/shifts/scales). The committed stats JSON characterises the
ENGINE's output envelope; swapping in real weights changes only where
objects sit, not the constraint set.

Usage:
  PYTHONPATH=/root/repo python probes/_gen_segm_suite.py \
      [indir=/root/synth_places/val] [outdir=/root/segm_suite] \
      [stats_out=docs/mask_suite_stats/segm_engine_512.json]

Also generates the random_medium_512 suite over the SAME images and writes
its stats next to the segm one — the context row for the MIGRATION.md
table.
"""
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'bin'))

from lama_tpu.evaluation.segm_backend import (ADE20kPanopticPredictor,
                                              ade20k_thing_class_ids)


class LuminancePseudoSegmenter:
    """Deterministic, content-adaptive stand-in for the ADE20k semantic net:
    per-image luminance terciles -> (stuff, thing_a, thing_b) label map.
    Satisfies the SegmentationModule.predict protocol used by
    ADE20kPanopticPredictor."""

    def __init__(self):
        things = sorted(ade20k_thing_class_ids())
        self.thing_a, self.thing_b = things[0], things[len(things) // 2]

    def predict(self, images, seg_size=None):
        images = np.asarray(images)
        b, h, w = images.shape[:3]
        labels = np.zeros((b, h, w), np.int32)
        for i in range(b):
            y = images[i].mean(axis=-1)
            lo, hi = np.percentile(y, [45, 75])
            lab = np.zeros((h, w), np.int32)
            lab[(y >= lo) & (y < hi)] = self.thing_a
            lab[y >= hi] = self.thing_b
            labels[i] = lab
        return labels, None


def main():
    args = dict(a.split('=', 1) for a in sys.argv[1:])
    indir = args.get('indir', '/root/synth_places/val')
    outdir = args.get('outdir', '/root/segm_suite')
    stats_out = args.get(
        'stats_out', os.path.join(REPO, 'docs/mask_suite_stats/segm_engine_512.json'))

    import gen_mask_dataset
    import mask_suite_stats
    import yaml

    src = sorted(glob.glob(os.path.join(indir, '*.png')))
    src = [p for p in src if '_mask' not in os.path.basename(p)]
    print(f'{len(src)} source images from {indir}', flush=True)

    # --- segm suite through the product pipeline
    segm_cfg = dict(
        generator_kind='segmentation',
        mask_generator_kwargs=dict(
            predictor=ADE20kPanopticPredictor(
                segmentation_module=LuminancePseudoSegmenter()),
            # reference SegmentationMask defaults (mask.py:142-157) except
            # downsample_levels: 512-side crops need <= 2^9
            downsample_levels=6, num_variants_per_mask=4),
        cropping=dict(out_min_size=512, handle_small_mode='upscale',
                      out_square_crop=False),
        max_tamper_area=0.5, max_masks_per_image=4)
    segm_dir = os.path.join(outdir, 'segm')
    os.makedirs(segm_dir, exist_ok=True)
    gen_mask_dataset.process_images(src, indir, segm_dir, segm_cfg, seed=42)
    n_segm = len(glob.glob(os.path.join(segm_dir, '**', '*_mask*.png'),
                           recursive=True))
    print(f'segm suite: {n_segm} masks in {segm_dir}', flush=True)

    # --- random_medium_512 suite over the same images (context row)
    with open(os.path.join(REPO, 'configs/data_gen/random_medium_512.yaml')) as f:
        rand_cfg = yaml.safe_load(f)
    rand_dir = os.path.join(outdir, 'random_medium')
    os.makedirs(rand_dir, exist_ok=True)
    gen_mask_dataset.process_images(src, indir, rand_dir, rand_cfg, seed=42)
    n_rand = len(glob.glob(os.path.join(rand_dir, '**', '*_mask*.png'),
                           recursive=True))
    print(f'random_medium suite: {n_rand} masks in {rand_dir}', flush=True)

    # --- stats via the product CLI
    os.makedirs(os.path.dirname(stats_out), exist_ok=True)
    rand_stats_out = os.path.join(os.path.dirname(stats_out),
                                  'random_medium_512.json')
    import argparse
    for suite, out in ((segm_dir, stats_out), (rand_dir, rand_stats_out)):
        rc = mask_suite_stats.main(argparse.Namespace(
            suite_dir=suite, out=out, compare=None, tolerance=0.25,
            mask_glob='**/*_mask*.png'))
        assert rc in (0, None), rc
        with open(out) as f:
            s = json.load(f)
        print(f'\n{out}:')
        print(json.dumps({k: s[k] for k in ('n_masks', 'area', 'n_components',
                                            'solidity')
                          if k in s}, indent=1, default=str)[:800], flush=True)


if __name__ == '__main__':
    main()
