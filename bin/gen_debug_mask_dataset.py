#!/usr/bin/env python3
"""Sliding-square debug masks — analogue of reference
bin/gen_debug_mask_dataset.py (config: configs/debug_mask_gen.yaml)."""
import argparse
import glob
import os
import shutil

import cv2
import numpy as np
import PIL.Image as Image
import yaml


def generate_masks_for_img(infile, outmask_pattern, mask_size=200, step=0.5):
    inimg = Image.open(infile)
    width, height = inimg.size
    step_abs = int(mask_size * step)

    mask = np.zeros((height, width), dtype='uint8')
    mask_i = 0
    for sv in range(0, height - step_abs, step_abs):
        for sh in range(0, width - step_abs, step_abs):
            mask[sv:sv + mask_size, sh:sh + mask_size] = 255
            cv2.imwrite(outmask_pattern.format(mask_i), mask)
            mask[sv:sv + mask_size, sh:sh + mask_size] = 0
            mask_i += 1


def main(args):
    if not args.indir.endswith('/'):
        args.indir += '/'
    if not args.outdir.endswith('/'):
        args.outdir += '/'
    with open(args.config) as f:
        config = yaml.safe_load(f)

    in_files = sorted(glob.glob(os.path.join(args.indir, '**', f'*{config["img_ext"]}'),
                                recursive=True))
    for infile in in_files:
        outimg = args.outdir + infile[len(args.indir):]
        outmask_pattern = outimg[:-len(config['img_ext'])] + '_mask{:04d}.png'
        os.makedirs(os.path.dirname(outimg), exist_ok=True)
        shutil.copy2(infile, outimg)
        generate_masks_for_img(infile, outmask_pattern, **config.get('gen_kwargs', {}))


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('indir')
    parser.add_argument('outdir')
    main(parser.parse_args())
