#!/usr/bin/env python3
"""Comparison grids across multiple prediction dirs — analogue of reference
bin/side_by_side.py. One output image per sample: [GT | pred_1 | pred_2 ...]
with mask boundary marked on the GT."""
import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np
import yaml


def main(args):
    from lama_tpu.data.datasets import PrecomputedInpaintingResultsDataset
    from lama_tpu.training.visualizers import visualize_mask_and_images

    with open(args.config) as f:
        config = yaml.safe_load(f)

    datasets = [PrecomputedInpaintingResultsDataset(args.datadir, d,
                                                    **config.get('dataset_kwargs', {}))
                for d in args.predictdirs]
    assert len({len(ds) for ds in datasets}) == 1, [len(ds) for ds in datasets]

    indices = list(range(len(datasets[0])))
    if len(indices) > args.max_n:
        indices = sorted(random.sample(indices, args.max_n))

    os.makedirs(args.outpath, exist_ok=True)
    seen = {}
    keys = ['image'] + list(range(len(datasets)))
    for img_i in indices:
        try:
            mask_fname = os.path.basename(datasets[0].mask_filenames[img_i])
            if mask_fname in seen:
                seen[mask_fname] += 1
                stem, ext = os.path.splitext(mask_fname)
                mask_fname = f'{stem}_{seen[mask_fname]}{ext}'
            else:
                seen[mask_fname] = 1

            vis_dict = datasets[0][img_i]
            for ds_i, ds in enumerate(datasets):
                vis_dict[ds_i] = ds[img_i]['inpainted']

            vis_img = visualize_mask_and_images(vis_dict, keys,
                                                last_without_mask=False,
                                                mask_only_first=True,
                                                black_mask=args.black)
            vis_img = np.clip(vis_img * 255, 0, 255).astype('uint8')
            cv2.imwrite(os.path.join(args.outpath, mask_fname),
                        cv2.cvtColor(vis_img, cv2.COLOR_RGB2BGR))
        except Exception as ex:
            print(f'Could not process {img_i} due to {ex}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--max-n', type=int, default=100)
    parser.add_argument('--black', action='store_true',
                        help='fill the mask on GT with black')
    parser.add_argument('config', help='eval config (e.g. configs/eval2.yaml)')
    parser.add_argument('outpath')
    parser.add_argument('datadir')
    parser.add_argument('predictdirs', nargs='+')
    main(parser.parse_args())
