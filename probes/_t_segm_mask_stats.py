"""Probe: mask-distribution statistics of the ADE20k segm-mask backend
(VERDICT r3 item 7).

The reference generates segmentation-guided masks with detectron2
PanopticFPN R101 (evaluation/masks/mask.py:358-407) but ships NO segm
data_gen preset and NO numeric mask distribution (all six
configs/data_gen/*.yaml are generator_kind=random with segm_proba=0), so
there is no reference number to diff against without the detectron2 blobs.
This probe records OUR backend's output statistics (bin/mask_suite_stats.py
aggregates) under two predictors:
  stub    deterministic multi-region segments -> characterises the placement
          ENGINE (area/count/solidity envelope imposed by the constraints)
  random  the real SegmentationModule with random weights -> end-to-end smoke
The protocol for the day detectron2+weights are reachable: generate the same
suite with both backends and `bin/mask_suite_stats.py --compare`.

Run: python probes/_t_segm_mask_stats.py [n_images=12]
"""
import os
import sys

import numpy as np

os.environ.setdefault('LAMA_COMPILATION_CACHE', 'off')
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'bin'))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests'))

from mask_suite_stats import _agg, mask_stats  # noqa: E402


def synth_image(rng, s=256):
    yy, xx = np.mgrid[0:s, 0:s] / float(s - 1)
    img = np.stack([yy, xx, 0.5 + 0.5 * np.sin(6 * np.pi * yy)], axis=-1)
    img = img.astype(np.float32)
    for _ in range(rng.randint(2, 6)):
        y0, x0 = rng.randint(0, s - 40, 2)
        h, w = rng.randint(20, 90, 2)
        img[y0:y0 + h, x0:x0 + w] = rng.rand(3)
    return np.clip(img, 0, 1)


def run_backend(name, predictor, n_images):
    from lama_tpu.evaluation.masks import SegmentationMask
    sm = SegmentationMask(predictor=predictor, downsample_levels=5,
                          num_variants_per_mask=3)
    rng = np.random.RandomState(3)
    per_mask, per_image = [], []
    for i in range(n_images):
        img = synth_image(rng)
        masks = sm.get_masks(img)
        per_image.append(len(masks))
        per_mask.extend(mask_stats(m) for m in masks)
    print(f'\n[{name}] {sum(per_image)} masks over {n_images} images')
    print('  masks/image:', _agg(per_image))
    for key in ('area', 'n_components', 'solidity', 'extent'):
        print(f'  {key}:', _agg([s[key] for s in per_mask]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    from test_segm_backend import StubSegmentationModule  # noqa: E402
    from lama_tpu.evaluation.segm_backend import ADE20kPanopticPredictor
    run_backend('stub', ADE20kPanopticPredictor(
        segmentation_module=StubSegmentationModule()), n)
    run_backend('random-weights', ADE20kPanopticPredictor(
        weights_path=None, allow_random_weights=True), n)


if __name__ == '__main__':
    main()
