#!/usr/bin/env python3
"""Mask synthesis example — analogue of reference bin/mask_example.py.
Draws a grid of each procedural mask kind over one image (the reference
version exercises SegmentationMask, which needs a panoptic backend; pass
--segmentation with a backend available to use it)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def main(args):
    from lama_tpu.data.io import load_image, save_image
    from lama_tpu.data.masks import (DumbAreaMaskGenerator, MixedMaskGenerator,
                                     OutpaintingMaskGenerator,
                                     RandomIrregularMaskGenerator,
                                     RandomRectangleMaskGenerator,
                                     RandomSuperresMaskGenerator)

    img = load_image(args.image) if args.image else \
        np.random.RandomState(0).rand(256, 256, 3).astype(np.float32)
    rng = np.random.RandomState(args.seed)
    shape = (img.shape[0], img.shape[1])

    generators = {
        'irregular': RandomIrregularMaskGenerator(max_len=100, max_width=50,
                                                  min_times=2, max_times=5),
        'rectangle': RandomRectangleMaskGenerator(bbox_min_size=30, bbox_max_size=100),
        'superres': RandomSuperresMaskGenerator(),
        'dumb': DumbAreaMaskGenerator(is_training=True),
        'outpainting': OutpaintingMaskGenerator(),
        'mixed': MixedMaskGenerator(irregular_proba=1, box_proba=1, segm_proba=0),
    }
    os.makedirs(args.outdir, exist_ok=True)
    for name, gen in generators.items():
        mask = gen(shape, rng=rng)
        vis = img * (1 - mask) + mask * np.array([1.0, 0, 0])
        save_image(os.path.join(args.outdir, f'{name}.png'), vis)
        print(f'{name}: area {mask.mean():.3f}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--image', default=None)
    parser.add_argument('--outdir', default='mask_examples')
    parser.add_argument('--seed', type=int, default=0)
    main(parser.parse_args())
