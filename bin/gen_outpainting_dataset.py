#!/usr/bin/env python3
"""Border-mask (outpainting) eval sets — analogue of reference
bin/gen_outpainting_dataset.py: either crop-style border masks or expand the
canvas with a masked border."""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def main(args):
    from lama_tpu.data.io import load_image

    if not args.indir.endswith('/'):
        args.indir += '/'
    for in_img in sorted(glob.glob(os.path.join(args.indir, '**', '*' + args.img_suffix),
                                   recursive=True)):
        if 'mask' in os.path.basename(in_img):
            continue
        out_img_path = os.path.join(args.outdir,
                                    os.path.splitext(in_img[len(args.indir):])[0] + '.png')
        out_mask_path = f'{os.path.splitext(out_img_path)[0]}_mask.png'
        os.makedirs(os.path.dirname(out_img_path), exist_ok=True)

        img = load_image(in_img)  # HWC
        height, width = img.shape[:2]
        pad_h, pad_w = int(height * args.coef / 2), int(width * args.coef / 2)
        mask = np.zeros((height, width), dtype='uint8')

        if args.expand:
            img = np.pad(img, ((pad_h, pad_h), (pad_w, pad_w), (0, 0)))
            mask = np.pad(mask, ((pad_h, pad_h), (pad_w, pad_w)),
                          mode='constant', constant_values=255)
        else:
            mask[:pad_h] = 255
            mask[-pad_h:] = 255
            mask[:, :pad_w] = 255
            mask[:, -pad_w:] = 255

        out = np.clip(img * 255, 0, 255).astype('uint8')
        cv2.imwrite(out_img_path, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        cv2.imwrite(out_mask_path, mask)
    print(f'Outpainting dataset written to {args.outdir}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('indir')
    parser.add_argument('outdir')
    parser.add_argument('--img-suffix', type=str, default='.png')
    parser.add_argument('--expand', action='store_true',
                        help='pad canvas (true) vs mask borders in place (false)')
    parser.add_argument('--coef', type=float, default=0.2)
    main(parser.parse_args())
