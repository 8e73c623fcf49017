#!/usr/bin/env python3
"""Filter webdataset-style tar shards by a Places category list and reshard —
analogue of reference bin/filter_sharded_dataset.py, implemented on stdlib
tarfile (webdataset is not available here). Samples are grouped by key
(path without extension); a sample passes if any allowed category appears in
its key.

Usage:
  python bin/filter_sharded_dataset.py 'shards-{000..009}.tar' 'out-%05d.tar' \
      [--categories configs/places2-categories_157.txt] [--shard-size 5000]
"""
import argparse
import glob
import os
import random
import re
import sys
import tarfile

DEFAULT_CATS_FILE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                 'configs', 'places2-categories_157.txt')


def brace_expand(pattern):
    """Minimal {000..009} brace expansion."""
    m = re.search(r'\{(\d+)\.\.(\d+)\}', pattern)
    if not m:
        return sorted(glob.glob(pattern)) or [pattern]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    return [pattern[:m.start()] + str(i).zfill(width) + pattern[m.end():]
            for i in range(int(lo), int(hi) + 1)]


def iter_samples(tar_path):
    """Yield (key, [(name, bytes), ...]) groups from a webdataset tar."""
    with tarfile.open(tar_path) as tf:
        cur_key, cur_files = None, []
        for member in tf:
            if not member.isfile():
                continue
            key = os.path.splitext(member.name)[0]
            data = tf.extractfile(member).read()
            if key != cur_key and cur_key is not None:
                yield cur_key, cur_files
                cur_files = []
            cur_key = key
            cur_files.append((member.name, data))
        if cur_key is not None:
            yield cur_key, cur_files


class ShardWriter:
    def __init__(self, pattern, shard_size=5000):
        self.pattern = pattern
        self.shard_size = shard_size
        self.shard_i = -1
        self.count = 0
        self.tar = None
        self._next_shard()

    def _next_shard(self):
        if self.tar is not None:
            self.tar.close()
        self.shard_i += 1
        self.count = 0
        path = self.pattern % self.shard_i if '%' in self.pattern \
            else self.pattern.format(self.shard_i)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.tar = tarfile.open(path, 'w')

    def write(self, files):
        import io
        if self.count >= self.shard_size:
            self._next_shard()
        for name, data in files:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            self.tar.addfile(info, io.BytesIO(data))
        self.count += 1

    def close(self):
        if self.tar is not None:
            self.tar.close()


def main(args):
    if args.categories == 'nofilter':
        good_categories = None
    else:
        with open(args.categories) as f:
            good_categories = set(line.strip().split(' ')[0] for line in f if line.strip())

    writer = ShardWriter(args.outpattern, shard_size=args.shard_size)
    good_samples = bad_samples = 0
    for tar_path in brace_expand(args.infile):
        for key, files in iter_samples(tar_path):
            if good_categories is not None and \
                    not any(c in key for c in good_categories):
                bad_samples += 1
                continue
            writer.write(files)
            good_samples += 1
            if good_samples % args.print_freq == 0:
                print(f'good {good_samples} bad {bad_samples}')
    writer.close()
    print(f'Done: good {good_samples}, filtered out {bad_samples}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--categories', type=str, default=DEFAULT_CATS_FILE)
    parser.add_argument('--shard-size', type=int, default=5000)
    parser.add_argument('--print-freq', type=int, default=1000)
    parser.add_argument('infile', help="tar path, glob, or {000..009} pattern")
    parser.add_argument('outpattern', help="e.g. 'out-%%05d.tar'")
    main(parser.parse_args())
