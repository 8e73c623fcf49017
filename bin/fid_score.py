#!/usr/bin/env python3
"""Standalone path-vs-path FID (analogue of the reference's vendored
evaluation/losses/fid/fid_score.py CLI): computes FID between two image
folders using the FID InceptionV3 activations."""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def folder_activations(path, inception, batch_size, exts=('jpg', 'jpeg', 'png')):
    from lama_tpu.data.io import load_image
    files = sorted(f for ext in exts
                   for f in glob.glob(os.path.join(path, '**', f'*.{ext}'),
                                      recursive=True))
    if not files:
        raise FileNotFoundError(f'no images under {path}')
    acts = []
    for start in range(0, len(files), batch_size):
        imgs = [load_image(f) for f in files[start:start + batch_size]]
        hmin = min(i.shape[0] for i in imgs)
        wmin = min(i.shape[1] for i in imgs)
        batch = np.stack([i[:hmin, :wmin] for i in imgs])
        acts.append(np.asarray(inception(batch)))
    return np.concatenate(acts)


def main(args):
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from lama_tpu.evaluation.fid import InceptionActivations, fid_from_activations

    inception = InceptionActivations.get(weights_path=args.weights)
    act1 = folder_activations(args.path1, inception, args.batch_size)
    act2 = folder_activations(args.path2, inception, args.batch_size)
    print(f'FID: {fid_from_activations(act1, act2):.4f} '
          f'({act1.shape[0]} vs {act2.shape[0]} images)')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('path1')
    parser.add_argument('path2')
    parser.add_argument('--batch-size', type=int, default=50)
    parser.add_argument('--weights', default=None,
                        help='pt_inception-2015-12-05 torch weights path')
    parser.add_argument('--device', default=None, choices=[None, 'cpu', 'tpu'])
    main(parser.parse_args())
