#!/usr/bin/env python3
"""Sample the 30k-image evaluation subset of Places val — analogue of
reference fetch_data/eval_sampler.py (the paper's metric protocol set)."""
import argparse
import os
import random


def main(args):
    root = os.path.abspath(args.root)
    val_files_path = os.path.join(root, 'original', 'val')
    out_list = os.path.join(root, 'original', 'eval_random_files.txt')
    val_files = [os.path.join(val_files_path, f) for f in os.listdir(val_files_path)]
    print(f'Sampling {args.n} images out of {len(val_files)} in {val_files_path} '
          f'-> {out_list}')
    random.shuffle(val_files)
    with open(out_list, 'w') as f:
        for filename in val_files[:args.n]:
            f.write(filename + '\n')
    print('...done')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', default='places_standard_dataset')
    parser.add_argument('--n', type=int, default=30000)
    main(parser.parse_args())
