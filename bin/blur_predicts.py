#!/usr/bin/env python3
"""Gaussian-blur baseline over predictions — analogue of reference
bin/blur_predicts.py: blur the inpainted region, keep known pixels."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np
import yaml


def main(args):
    from lama_tpu.data.datasets import PrecomputedInpaintingResultsDataset

    with open(args.config) as f:
        config = yaml.safe_load(f)
    if not args.predictdir.endswith('/'):
        args.predictdir += '/'

    dataset = PrecomputedInpaintingResultsDataset(args.datadir, args.predictdir,
                                                  **config.get('dataset_kwargs', {}))
    for img_i in range(len(dataset)):
        pred_fname = dataset.pred_filenames[img_i]
        cur_out_fname = os.path.join(args.outpath, pred_fname[len(args.predictdir):])
        os.makedirs(os.path.dirname(cur_out_fname), exist_ok=True)

        sample = dataset[img_i]
        img, mask, inpainted = sample['image'], sample['mask'], sample['inpainted']
        blurred = cv2.GaussianBlur(inpainted, ksize=(args.k, args.k),
                                   sigmaX=args.s, sigmaY=args.s,
                                   borderType=cv2.BORDER_REFLECT)
        cur_res = (1 - mask) * img + mask * blurred
        cur_res = np.clip(cur_res * 255, 0, 255).astype('uint8')
        cv2.imwrite(cur_out_fname, cv2.cvtColor(cur_res, cv2.COLOR_RGB2BGR))
    print(f'Blurred {len(dataset)} predictions -> {args.outpath}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('config', help='eval config')
    parser.add_argument('datadir')
    parser.add_argument('predictdir')
    parser.add_argument('outpath')
    parser.add_argument('-s', type=float, default=0.1, help='gaussian sigma')
    parser.add_argument('-k', type=int, default=5, help='gaussian kernel size')
    main(parser.parse_args())
