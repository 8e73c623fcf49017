#!/usr/bin/env python3
"""Visual sampling of an eval set per mask-area bin — analogue of reference
bin/sample_from_dataset.py (saves masked images)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(args):
    from lama_tpu.data.datasets import InpaintingDataset
    from lama_tpu.evaluation.vis import save_masked_img_for_sidebyside

    dataset = InpaintingDataset(args.datadir, img_suffix='.png')
    area_bins = np.linspace(0, 1, args.area_bins + 1)
    bin_titles = [f'{area_bins[i] * 100:.0f}-{area_bins[i + 1] * 100:.0f}'
                  for i in range(args.area_bins)]
    bin2i = [[] for _ in range(args.area_bins)]

    for i in range(len(dataset)):
        item = dataset[i]
        h, w = item['image'].shape[:2]
        hole_percent = (item['mask'] == 1).sum() / (h * w)
        bin_i = int(np.clip(np.searchsorted(area_bins, hole_percent) - 1, 0,
                            args.area_bins - 1))
        bin2i[bin_i].append(i)

    os.makedirs(args.outdir, exist_ok=True)
    for bin_i in range(args.area_bins):
        bindir = os.path.join(args.outdir, bin_titles[bin_i])
        os.makedirs(bindir, exist_ok=True)
        bin_idx = bin2i[bin_i]
        for sample_i in np.random.choice(bin_idx,
                                         size=min(len(bin_idx), args.samples_n),
                                         replace=False):
            item = dataset[int(sample_i)]
            path = os.path.join(bindir,
                                os.path.basename(dataset.img_filenames[int(sample_i)]))
            save_masked_img_for_sidebyside(item, path)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--datadir', required=True)
    parser.add_argument('--outdir', required=True)
    parser.add_argument('--samples-n', type=int, default=10)
    parser.add_argument('--area-bins', type=int, default=10)
    main(parser.parse_args())
