#!/usr/bin/env python3
"""Re-shard a tar into fixed-size webdataset shards — analogue of reference
bin/split_tar.py (stdlib tarfile implementation)."""
import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from filter_sharded_dataset import ShardWriter, brace_expand, iter_samples


def main(args):
    writer = ShardWriter(args.outpattern, shard_size=args.shard_size)
    n = 0
    for tar_path in brace_expand(args.infile):
        for key, files in iter_samples(tar_path):
            writer.write(files)
            n += 1
    writer.close()
    print(f'Wrote {n} samples')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('infile')
    parser.add_argument('outpattern')
    parser.add_argument('--shard-size', type=int, default=5000)
    main(parser.parse_args())
