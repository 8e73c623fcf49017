#!/usr/bin/env python3
"""Executable smoke example for the evaluator — analogue of reference
bin/evaluator_example.py: a constant-fill 'model' over a synthetic
square-mask dataset, run through the full InpaintingEvaluator."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class SimpleDataset:
    """Random images with centred square masks."""

    def __init__(self, n=16, size=64):
        self.n = n
        self.size = size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        img = rng.rand(self.size, self.size, 3).astype(np.float32)
        mask = np.zeros((self.size, self.size, 1), np.float32)
        q = self.size // 4 + (i % 4) * 2
        mask[q:-q or None, q:-q or None] = 1
        return dict(image=img, mask=mask)


def constant_fill_model(image_batch, mask_batch, fill_value=0.5):
    """The 'model': fills the hole with a constant (reference Model class)."""
    return image_batch * (1 - mask_batch) + fill_value * mask_batch


def main():
    import jax
    if len(sys.argv) > 1 and sys.argv[1] == '--cpu':
        jax.config.update('jax_platforms', 'cpu')

    from lama_tpu.evaluation.evaluator import InpaintingEvaluator
    from lama_tpu.evaluation.scores import SSIMScore

    dataset = SimpleDataset()
    evaluator = InpaintingEvaluator(dataset, scores={'ssim': SSIMScore()},
                                    batch_size=4)
    results = evaluator.evaluate(model=constant_fill_model)
    for key, value in sorted(results.items()):
        print(key, {k: round(float(v), 4) for k, v in value.items()})


if __name__ == '__main__':
    main()
