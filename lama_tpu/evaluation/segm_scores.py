"""Segmentation-aware metrics (reference evaluation/losses/base_loss.py:221-528):
per-ADE20k-class attribution of SSIM/LPIPS/FID inside the mask, plus class
frequency statistics. The segmenter is our JAX ADE20k module; the FID
per-class attribution uses leave-one-out deltas (joblib-parallel on host).
"""
import csv
import logging
import os
from typing import Dict, Optional

import jax
import numpy as np

from .fid import InceptionActivations
from .lpips import LPIPS
from .scores import get_groupings
from .ssim import ssim as ssim_fn

LOGGER = logging.getLogger(__name__)

NUM_CLASS = 150
_RESOURCES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          'resources')


def get_segmentation_idx2name() -> Dict[int, str]:
    """0-based class index -> name, from the vendored object150_info.csv
    (reference base_loss.py:268-270 reads the same table)."""
    idx2name = {}
    with open(os.path.join(_RESOURCES, 'object150_info.csv')) as f:
        for row in csv.DictReader(f):
            idx2name[int(row['Idx']) - 1] = row['Name']
    return idx2name


def distribute_values_to_classes(target_class_freq_by_image_mask, values, idx2name):
    """Weight per-image values by per-class pixel frequencies inside the mask
    (reference base_loss.py:262-268)."""
    assert target_class_freq_by_image_mask.ndim == 2
    assert target_class_freq_by_image_mask.shape[0] == values.shape[0]
    total_class_freq = target_class_freq_by_image_mask.sum(0)
    distr_values = (target_class_freq_by_image_mask * values[..., None]).sum(0)
    result = distr_values / (total_class_freq + 1e-3)
    return {idx2name[i]: val for i, val in enumerate(result) if total_class_freq[i] > 0}


class SegmentationAwareScore:
    """Accumulates per-image class pixel frequencies (total / in-mask for
    target and prediction) via the ADE20k segmenter."""

    def __init__(self, weights_path: Optional[str] = None, segm_network=None):
        from ..models.aux.segmentation import SegmentationModule
        self.segm_network = segm_network if segm_network is not None else \
            SegmentationModule(weights_path=weights_path,
                               use_default_normalization=True)
        self.reset()

    def reset(self):
        self.target_class_freq_by_image_total = []
        self.target_class_freq_by_image_mask = []
        self.pred_class_freq_by_image_mask = []

    def __call__(self, pred_batch, target_batch, mask):
        pred_segm = np.asarray(self.segm_network.predict(pred_batch)[0]
                               ).reshape(pred_batch.shape[0], -1)
        target_segm = np.asarray(self.segm_network.predict(target_batch)[0]
                                 ).reshape(pred_batch.shape[0], -1)
        mask_flat = np.asarray(mask).reshape(mask.shape[0], -1) > 0.5

        batch_total, batch_mask, batch_pred = [], [], []
        for p, t, m in zip(pred_segm, target_segm, mask_flat):
            batch_total.append(np.bincount(t, minlength=NUM_CLASS)[None])
            batch_mask.append(np.bincount(t[m], minlength=NUM_CLASS)[None])
            batch_pred.append(np.bincount(p[m], minlength=NUM_CLASS)[None])
        self.target_class_freq_by_image_total += batch_total
        self.target_class_freq_by_image_mask += batch_mask
        self.pred_class_freq_by_image_mask += batch_pred
        return (np.concatenate(batch_total), np.concatenate(batch_mask),
                np.concatenate(batch_pred))


class SegmentationAwarePairwiseScore(SegmentationAwareScore):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.segm_idx2name = get_segmentation_idx2name()
        self.individual_values = []

    def reset(self):
        super().reset()
        self.individual_values = []

    def calc_score(self, pred_batch, target_batch, mask):
        raise NotImplementedError

    def __call__(self, pred_batch, target_batch, mask):
        cur_class_stats = super().__call__(pred_batch, target_batch, mask)
        score_values = self.calc_score(pred_batch, target_batch, mask)
        self.individual_values.append(score_values)
        return cur_class_stats + (score_values,)

    def _collect(self, states):
        if states is not None:
            totals, masks, preds, values = (list(t) for t in zip(*states))
        else:
            totals = self.target_class_freq_by_image_total
            masks = self.target_class_freq_by_image_mask
            preds = self.pred_class_freq_by_image_mask
            values = self.individual_values
        return (np.concatenate(totals, axis=0), np.concatenate(masks, axis=0),
                np.concatenate(preds, axis=0), values)

    def get_value(self, groups=None, states=None):
        totals, masks, preds, values = self._collect(states)
        individual_values = np.concatenate(values, axis=0)
        total_results = {
            'mean': individual_values.mean(),
            'std': individual_values.std(),
            **distribute_values_to_classes(masks, individual_values, self.segm_idx2name),
        }
        if groups is None:
            self.reset()
            return total_results, None
        group_results = {}
        for label, index in get_groupings(groups).items():
            group_scores = individual_values[index]
            group_results[label] = {
                'mean': group_scores.mean(),
                'std': group_scores.std(),
                **distribute_values_to_classes(masks[index], group_scores,
                                               self.segm_idx2name),
            }
        self.reset()
        return total_results, group_results


class SegmentationClassStats(SegmentationAwarePairwiseScore):
    """Class frequency statistics (reference base_loss.py:340-437)."""

    def calc_score(self, pred_batch, target_batch, mask):
        return np.zeros(pred_batch.shape[0])

    def get_value(self, groups=None, states=None):
        totals, masks, preds, _ = self._collect(states)

        def stats(tot, msk, prd):
            tot_marginal = tot.sum(0).astype('float32')
            tot_marginal /= max(tot_marginal.sum(), 1e-8)
            mask_marginal = msk.sum(0).astype('float32')
            mask_marginal /= max(mask_marginal.sum(), 1e-8)
            freq_diff = (prd - msk).sum(0) / (msk.sum(0) + 1e-3)
            out = {}
            out.update({f'total_freq/{self.segm_idx2name[i]}': v
                        for i, v in enumerate(tot_marginal) if v > 0})
            out.update({f'mask_freq/{self.segm_idx2name[i]}': v
                        for i, v in enumerate(mask_marginal) if v > 0})
            out.update({f'mask_freq_diff/{self.segm_idx2name[i]}': v
                        for i, v in enumerate(freq_diff) if tot_marginal[i] > 0})
            return out

        total_results = stats(totals, masks, preds)
        if groups is None:
            self.reset()
            return total_results, None
        group_results = {}
        for label, index in get_groupings(groups).items():
            group_results[label] = stats(totals[index], masks[index], preds[index])
        self.reset()
        return total_results, group_results


class SegmentationAwareSSIM(SegmentationAwarePairwiseScore):
    def __init__(self, *args, window_size=11, **kwargs):
        super().__init__(*args, **kwargs)
        self._ssim = jax.jit(lambda a, b: ssim_fn(a, b, window_size=window_size,
                                                  size_average=False))

    def calc_score(self, pred_batch, target_batch, mask):
        return np.asarray(self._ssim(pred_batch, target_batch))


class SegmentationAwareLPIPS(SegmentationAwarePairwiseScore):
    def __init__(self, *args, model='net-lin', net='vgg', model_path=None, **kwargs):
        super().__init__(*args, **kwargs)
        self._lpips = LPIPS(lin_weights_path=model_path
                            or os.environ.get('LAMA_LPIPS_LIN_WEIGHTS'),
                            vgg_weights_path=os.environ.get('LAMA_LPIPS_VGG_WEIGHTS'))
        self._fn = jax.jit(self._lpips.__call__)

    def calc_score(self, pred_batch, target_batch, mask):
        return np.asarray(self._fn(pred_batch, target_batch)).ravel()


def _fid_without_image(img_i, activations_pred, activations_target, eps=1e-6):
    from .fid import calculate_frechet_distance
    a = activations_pred.copy()
    a[img_i] = activations_target[img_i]
    mu1, s1 = a.mean(0), np.cov(a, rowvar=False)
    mu2, s2 = activations_target.mean(0), np.cov(activations_target, rowvar=False)
    return calculate_frechet_distance(mu1, s1, mu2, s2, eps=eps)


class SegmentationAwareFID(SegmentationAwarePairwiseScore):
    """FID per-class attribution via leave-one-out deltas
    (reference base_loss.py:439-528)."""

    def __init__(self, *args, dims=2048, eps=1e-6, n_jobs=-1, **kwargs):
        super().__init__(*args, **kwargs)
        assert dims == 2048
        self.inception = InceptionActivations.get()
        self.eps = eps
        self.n_jobs = n_jobs

    def calc_score(self, pred_batch, target_batch, mask):
        return (np.asarray(self.inception(pred_batch)),
                np.asarray(self.inception(target_batch)))

    def get_value(self, groups=None, states=None):
        from .fid import calculate_frechet_distance
        totals, masks, preds, activation_pairs = self._collect(states)
        act_pred = np.concatenate([p for p, _ in activation_pairs], axis=0)
        act_target = np.concatenate([t for _, t in activation_pairs], axis=0)

        def frechet(a, b):
            return calculate_frechet_distance(a.mean(0), np.cov(a, rowvar=False),
                                              b.mean(0), np.cov(b, rowvar=False),
                                              eps=self.eps)

        total_results = {
            'mean': frechet(act_pred, act_target), 'std': 0,
            **self._distribute_fid(masks, act_pred, act_target),
        }
        if groups is None:
            self.reset()
            return total_results, None
        group_results = {}
        for label, index in get_groupings(groups).items():
            if len(index) > 1:
                group_results[label] = {
                    'mean': frechet(act_pred[index], act_target[index]), 'std': 0,
                    **self._distribute_fid(masks[index], act_pred[index],
                                           act_target[index]),
                }
            else:
                group_results[label] = dict(mean=float('nan'), std=0)
        self.reset()
        return total_results, group_results

    def _distribute_fid(self, class_freq, act_pred, act_target):
        from .fid import calculate_frechet_distance
        from joblib import Parallel, delayed
        real_fid = calculate_frechet_distance(
            act_pred.mean(0), np.cov(act_pred, rowvar=False),
            act_target.mean(0), np.cov(act_target, rowvar=False), eps=self.eps)
        fid_no_images = Parallel(n_jobs=self.n_jobs)(
            delayed(_fid_without_image)(i, act_pred, act_target, eps=self.eps)
            for i in range(act_pred.shape[0]))
        errors = real_fid - np.asarray(fid_no_images)
        return distribute_values_to_classes(class_freq, errors, self.segm_idx2name)
