#!/usr/bin/env python3
"""Extract masks from white (255) pixels of images — analogue of reference
bin/extract_masks.py."""
import argparse
import os

import numpy as np
import PIL.Image as Image


def main(args):
    if not args.indir.endswith('/'):
        args.indir += '/'
    os.makedirs(args.outdir, exist_ok=True)

    for fname in sorted(os.listdir(args.indir)):
        image = Image.open(args.indir + fname).convert('RGB')
        arr = np.array(image)
        mask = (arr[..., 0] == 255).astype(np.uint8) * 255
        out_name = os.path.join(args.outdir, os.path.splitext(fname)[0] + '_mask000.png')
        Image.fromarray(mask, mode='L').save(out_name)
    print(f'Extracted masks -> {args.outdir}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--indir', required=True)
    parser.add_argument('--outdir', required=True)
    main(parser.parse_args())
