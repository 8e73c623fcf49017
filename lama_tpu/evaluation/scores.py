"""Score accumulators (reference evaluation/losses/base_loss.py:92-218).

Each score is a host-side accumulator around a jitted device kernel:
`__call__(pred, target, mask)` computes per-image values (or activations) on
device, stores them on host, and returns the per-batch state — which is also
what the online evaluator collects across steps/hosts (`states` in
`get_value`, mirroring the reference's Lightning state gathering).
"""
import logging
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from .fid import InceptionActivations, calculate_frechet_distance
from .lpips import LPIPS
from .ssim import ssim

LOGGER = logging.getLogger(__name__)


def get_groupings(groups):
    """{group index: array of sample indices} (reference base_loss.py:22-34)."""
    label_groups, count_groups = np.unique(groups, return_counts=True)
    indices = np.argsort(groups)
    grouping = {}
    cur_start = 0
    for label, count in zip(label_groups, count_groups):
        cur_end = cur_start + count
        grouping[label] = indices[cur_start:cur_end]
        cur_start = cur_end
    return grouping


class PairwiseScore:
    def __init__(self):
        self.individual_values: Optional[np.ndarray] = None
        self.reset()

    def reset(self):
        self.individual_values = np.array([], dtype=np.float64)

    def get_value(self, groups=None, states=None) -> Tuple[Dict, Optional[Dict]]:
        individual_values = np.concatenate([np.asarray(s) for s in states]) \
            if states is not None else self.individual_values
        total_results = {
            'mean': float(individual_values.mean()),
            'std': float(individual_values.std()),
        }
        if groups is None:
            group_results = None
        else:
            group_results = {}
            grouping = get_groupings(groups)
            for label, index in grouping.items():
                group_scores = individual_values[index]
                group_results[label] = {'mean': float(group_scores.mean()),
                                        'std': float(group_scores.std())}
        self.reset()
        return total_results, group_results


class SSIMScore(PairwiseScore):
    def __init__(self, window_size=11):
        self._fn = jax.jit(lambda a, b: ssim(a, b, window_size=window_size,
                                             size_average=False))
        super().__init__()

    def __call__(self, pred_batch, target_batch, mask=None):
        batch_values = np.asarray(self._fn(pred_batch, target_batch))
        self.individual_values = np.hstack([self.individual_values, batch_values])
        return batch_values


class LPIPSScore(PairwiseScore):
    def __init__(self, model='net-lin', net='vgg', model_path=None,
                 vgg_weights_path=None, lin_weights_path=None):
        import os
        assert model == 'net-lin' and net == 'vgg', (model, net)
        self._lpips = LPIPS(
            vgg_weights_path=vgg_weights_path or os.environ.get('LAMA_LPIPS_VGG_WEIGHTS'),
            lin_weights_path=lin_weights_path or model_path
            or os.environ.get('LAMA_LPIPS_LIN_WEIGHTS'))
        self._fn = jax.jit(self._lpips.__call__)
        super().__init__()

    def __call__(self, pred_batch, target_batch, mask=None):
        batch_values = np.asarray(self._fn(pred_batch, target_batch)).ravel()
        self.individual_values = np.hstack([self.individual_values, batch_values])
        return batch_values


class FIDScore:
    """Accumulates pred/target inception activations; Fréchet distance on
    host at get_value (total + per-group) — reference base_loss.py:155-218."""

    def __init__(self, dims=2048, eps=1e-6, weights_path=None):
        assert dims == 2048
        self.model = InceptionActivations.get(weights_path=weights_path)
        self.eps = eps
        self.reset()

    def reset(self):
        self.activations_pred: List[np.ndarray] = []
        self.activations_target: List[np.ndarray] = []

    def __call__(self, pred_batch, target_batch, mask=None):
        act_pred = np.asarray(self.model(pred_batch))
        act_target = np.asarray(self.model(target_batch))
        self.activations_pred.append(act_pred)
        self.activations_target.append(act_target)
        return act_pred, act_target

    def get_value(self, groups=None, states=None):
        if states is not None:
            pairs = list(states)
            activations_pred = np.concatenate([np.asarray(p) for p, _ in pairs])
            activations_target = np.concatenate([np.asarray(t) for _, t in pairs])
        else:
            activations_pred = np.concatenate(self.activations_pred)
            activations_target = np.concatenate(self.activations_target)

        def frechet(a, b):
            mu1, sigma1 = a.mean(axis=0), np.cov(a, rowvar=False)
            mu2, sigma2 = b.mean(axis=0), np.cov(b, rowvar=False)
            return float(calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=self.eps))

        total_results = {'mean': frechet(activations_pred, activations_target)}
        if groups is None:
            group_results = None
        else:
            group_results = {}
            for label, index in get_groupings(groups).items():
                if len(index) > 1:
                    group_results[label] = {
                        'mean': frechet(activations_pred[index], activations_target[index])}
                else:
                    group_results[label] = {'mean': float('nan')}
        self.reset()
        return total_results, group_results
