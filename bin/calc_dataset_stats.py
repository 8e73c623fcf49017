#!/usr/bin/env python3
"""Eval-set statistics — analogue of reference bin/calc_dataset_stats.py:
size/hole-area histograms, EDT distance-to-known stats, per-area-bin sample
grids."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.ndimage import distance_transform_edt


def main(args):
    from lama_tpu.data.datasets import InpaintingDataset
    from lama_tpu.evaluation.vis import save_item_for_vis

    dataset = InpaintingDataset(args.datadir, img_suffix='.png')
    area_bins = np.linspace(0, 1, args.area_bins + 1)
    bin_titles = [f'{area_bins[i] * 100:.0f}-{area_bins[i + 1] * 100:.0f}'
                  for i in range(args.area_bins)]

    heights, widths, image_areas = [], [], []
    hole_areas, hole_area_percents, known_pixel_distances = [], [], []
    area_bins_count = np.zeros(args.area_bins)
    bin2i = [[] for _ in range(args.area_bins)]

    for i in range(len(dataset)):
        item = dataset[i]
        h, w = item['image'].shape[:2]
        heights.append(h)
        widths.append(w)
        full_area = h * w
        image_areas.append(full_area)
        bin_mask = item['mask'][..., 0] > 0.5
        hole_area = int(bin_mask.sum())
        hole_areas.append(hole_area)
        hole_percent = hole_area / full_area
        hole_area_percents.append(hole_percent)
        bin_i = int(np.clip(np.searchsorted(area_bins, hole_percent) - 1, 0,
                            args.area_bins - 1))
        area_bins_count[bin_i] += 1
        bin2i[bin_i].append(i)
        dist = distance_transform_edt(bin_mask)
        known_pixel_distances.append(dist[bin_mask].mean() if bin_mask.any() else 0.0)

    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, 'summary.txt'), 'w') as f:
        f.write(f'''Location:          {args.datadir}

Number of samples: {len(dataset)}

Image height: min {min(heights):5d} max {max(heights):5d} mean {np.mean(heights):.2f}
Image width:  min {min(widths):5d} max {max(widths):5d} mean {np.mean(widths):.2f}
Image area:   min {min(image_areas):7d} max {max(image_areas):7d} mean {np.mean(image_areas):.2f}
Hole area:    min {min(hole_areas):7d} max {max(hole_areas):7d} mean {np.mean(hole_areas):.2f}
Hole area %:  min {min(hole_area_percents) * 100:2.2f} max {max(hole_area_percents) * 100:2.2f} mean {np.mean(hole_area_percents) * 100:2.2f}
Dist 2known:  min {min(known_pixel_distances):2.2f} max {max(known_pixel_distances):2.2f} mean {np.mean(known_pixel_distances):2.2f} median {np.median(known_pixel_distances):2.2f}

Stats by hole area %:
''')
        for bin_i in range(args.area_bins):
            f.write(f'{bin_titles[bin_i]}%: samples number {area_bins_count[bin_i]}, '
                    f'{area_bins_count[bin_i] / len(dataset) * 100:.1f}%\n')

    for bin_i in range(args.area_bins):
        bindir = os.path.join(args.outdir, 'samples', bin_titles[bin_i])
        os.makedirs(bindir, exist_ok=True)
        bin_idx = bin2i[bin_i]
        for sample_i in np.random.choice(bin_idx,
                                         size=min(len(bin_idx), args.samples_n),
                                         replace=False):
            save_item_for_vis(dataset[int(sample_i)],
                              os.path.join(bindir, f'{sample_i}.png'))
    print(f'Stats written to {args.outdir}/summary.txt')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('datadir', help='images+masks (output of gen_mask_dataset)')
    parser.add_argument('outdir')
    parser.add_argument('--samples-n', type=int, default=10)
    parser.add_argument('--area-bins', type=int, default=10)
    main(parser.parse_args())
