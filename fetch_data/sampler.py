#!/usr/bin/env python3
"""Sample fixed-size test/val subsets of a prepared Places dataset — analogue
of reference fetch_data/sampler.py (2000 test images for checkpoint
selection, 100 val images for visual inspection)."""
import argparse
import os
import random


def sample_split(files_path, out_list, n, purpose):
    files = [os.path.join(files_path, f) for f in os.listdir(files_path)]
    print(f'Sampling {n} images out of {len(files)} in {files_path} -> {out_list}')
    print(purpose)
    random.shuffle(files)
    with open(out_list, 'w') as f:
        for filename in files[:n]:
            f.write(filename + '\n')
    print('...done')


def main(args):
    root = os.path.abspath(args.root)
    sample_split(os.path.join(root, 'original', 'test'),
                 os.path.join(root, 'original', 'test_random_files.txt'),
                 args.test_n,
                 'Training picks best checkpoints by metrics computed on these images.')
    sample_split(os.path.join(root, 'original', 'val'),
                 os.path.join(root, 'original', 'val_random_files.txt'),
                 args.val_n,
                 'Used for visual check-up of the inpainting epoch to epoch.')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', default='places_standard_dataset')
    parser.add_argument('--test-n', type=int, default=2000)
    parser.add_argument('--val-n', type=int, default=100)
    main(parser.parse_args())
