#!/usr/bin/env python3
"""Offline metric evaluation over precomputed predictions — analogue of
reference bin/evaluate_predicts.py.

Usage:
  python bin/evaluate_predicts.py <config.yaml> <datadir> <predictdir> <outpath.csv>
         [--device cpu]

config: e.g. configs/eval2.yaml (evaluator_kwargs + dataset_kwargs).
Outputs a tab-separated table keyed by metric × mask-area bin.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGGER = logging.getLogger(__name__)


def run_evaluation(config: dict, datadir: str, predictdir: str,
                   metrics=None) -> dict:
    """The eval2 protocol core, shared with bin/verify_reference_parity.py:
    build the precomputed-results dataset + score stack from an eval config
    dict and return the raw {(metric, group): {stat: value}} results."""
    import os

    from lama_tpu.data.datasets import PrecomputedInpaintingResultsDataset
    from lama_tpu.evaluation.evaluator import (InpaintingEvaluator,
                                               lpips_fid100_f1)
    from lama_tpu.evaluation.scores import FIDScore, LPIPSScore, SSIMScore

    dataset = PrecomputedInpaintingResultsDataset(
        datadir, predictdir, **config.get('dataset_kwargs', {}))

    ctors = {'ssim': SSIMScore, 'lpips': LPIPSScore, 'fid': FIDScore}
    if config.get('evaluator_kwargs', {}).get('segmentation') or \
            (metrics and 'segm' in metrics):
        from lama_tpu.evaluation.segm_scores import (SegmentationAwareFID,
                                                     SegmentationAwareLPIPS,
                                                     SegmentationAwareSSIM,
                                                     SegmentationClassStats)
        seg_weights = os.environ.get('TORCH_HOME')
        ctors.update({
            'segm_stats': lambda: SegmentationClassStats(weights_path=seg_weights),
            'segm_ssim': lambda: SegmentationAwareSSIM(weights_path=seg_weights),
            'segm_lpips': lambda: SegmentationAwareLPIPS(weights_path=seg_weights),
            'segm_fid': lambda: SegmentationAwareFID(weights_path=seg_weights),
        })
    enabled = metrics.split(',') if metrics else ['ssim', 'lpips', 'fid']
    scores = {k: ctors[k]() for k in enabled}

    ev_kwargs = dict(config.get('evaluator_kwargs', {}))
    ev_kwargs.pop('device', None)
    ev_kwargs.pop('segmentation', None)
    has_integral = 'lpips' in scores and 'fid' in scores
    evaluator = InpaintingEvaluator(
        dataset, scores=scores,
        integral_title='lpips_fid100_f1' if has_integral else None,
        integral_func=lpips_fid100_f1 if has_integral else None,
        **ev_kwargs)
    return evaluator.evaluate()


def results_to_table(results):
    import pandas as pd
    table = pd.DataFrame(results).stack(future_stack=True).unstack(level=0)
    table.dropna(axis=1, how='all', inplace=True)
    return table


def main(args):
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    import yaml

    logging.basicConfig(level=logging.INFO, force=True)  # jax pre-configures the root logger
    from lama_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    with open(args.config) as f:
        config = yaml.safe_load(f)

    results = run_evaluation(config, args.datadir, args.predictdir,
                             metrics=args.metrics)
    table = results_to_table(results)
    table.to_csv(args.outpath, sep='\t', float_format='%.4f')
    print(table)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('config', help='eval config, e.g. configs/eval2.yaml')
    parser.add_argument('datadir', help='dir with images and masks')
    parser.add_argument('predictdir', help='dir with predictions')
    parser.add_argument('outpath', help='output table path (.tsv/.csv)')
    parser.add_argument('--metrics', default=None,
                        help='comma list: ssim,lpips,fid (default all)')
    parser.add_argument('--device', default=None, choices=[None, 'cpu', 'tpu'])
    main(parser.parse_args())
