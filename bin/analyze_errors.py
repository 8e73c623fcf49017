#!/usr/bin/env python3
"""Per-image error analysis — analogue of reference bin/analyze_errors.py:
fit a linear SVM separating real from inpainted inception features, use its
decision score as a per-image realism measure, dump score tables/histograms,
global best/worst galleries, per-real best/worst grids, and overlapping-mask
score-sensitivity pairs.

Usage:
  python bin/analyze_errors.py configs/analyze_mask_errors.yaml \
      <datadir> <predictdir> <outpath> [--only-report] [--device cpu]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np
import pandas as pd
import yaml


def draw_score(img, score):
    """uint8 HWC image annotated with the score (reference analyze_errors.py:18-27)."""
    img = np.ascontiguousarray(np.clip(img * 255, 0, 255).astype('uint8'))
    cv2.putText(img, f'{score:.2f}', (40, 40), cv2.FONT_HERSHEY_SIMPLEX, 1,
                (0, 255, 0), 2)
    return img


def save_global_samples(mask_fnames, mask2real, mask2fake, out_dir,
                        real_scores, fake_scores):
    from lama_tpu.data.io import load_image
    for mask_fname in mask_fnames:
        real = draw_score(load_image(mask2real[mask_fname]),
                          real_scores.loc[mask2real[mask_fname], 'real_score'])
        fake = draw_score(load_image(mask2fake[mask_fname]),
                          fake_scores.loc[mask_fname, 'fake_score'])
        grid = np.concatenate([real, fake], axis=1)
        out_name = os.path.splitext(os.path.basename(mask_fname))[0] + '.jpg'
        cv2.imwrite(os.path.join(out_dir, out_name),
                    cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))


def mask_overlap(mask_a_fname, mask_b_fname):
    from lama_tpu.data.io import load_image
    a = load_image(mask_a_fname, mode='L')[..., 0] > 0.5
    b = load_image(mask_b_fname, mode='L')[..., 0] > 0.5
    inter = (a & b).sum()
    return inter / max(min(a.sum(), b.sum()), 1)


def main(args):
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import sklearn.svm

    from lama_tpu.data.datasets import PrecomputedInpaintingResultsDataset
    from lama_tpu.evaluation.fid import InceptionActivations

    with open(args.config) as f:
        config = yaml.safe_load(f)

    latents_dir = os.path.join(args.outpath, 'latents')
    os.makedirs(latents_dir, exist_ok=True)
    global_worst_dir = os.path.join(args.outpath, 'global_worst')
    global_best_dir = os.path.join(args.outpath, 'global_best')
    os.makedirs(global_worst_dir, exist_ok=True)
    os.makedirs(global_best_dir, exist_ok=True)

    if not args.only_report:
        inception = InceptionActivations.get()
        dataset = PrecomputedInpaintingResultsDataset(
            args.datadir, args.predictdir, **config.get('dataset_kwargs', {}))

        real2vec = {}
        real_features, fake_features = [], []
        orig_fnames, mask_fnames = [], []
        mask2real, mask2fake = {}, {}

        for i in range(len(dataset)):
            batch = dataset[i]
            orig_fname = dataset.img_filenames[i]
            mask_fname = dataset.mask_filenames[i]
            mask2real[mask_fname] = orig_fname
            mask2fake[mask_fname] = dataset.pred_filenames[i]

            if orig_fname not in real2vec:
                real2vec[orig_fname] = np.asarray(inception(batch['image'][None]))
            real_features.append(real2vec[orig_fname])
            fake_features.append(np.asarray(inception(batch['inpainted'][None])))
            orig_fnames.append(orig_fname)
            mask_fnames.append(mask_fname)

        features = np.concatenate(real_features + fake_features, axis=0)
        labels = np.array([1] * len(real_features) + [0] * len(fake_features))
        svm = sklearn.svm.LinearSVC(dual=False)
        svm.fit(features, labels)
        scores = svm.decision_function(features)
        real_scores = scores[:len(real_features)]
        fake_scores = scores[len(real_features):]

        for name, obj in [('orig_fnames', orig_fnames), ('mask_fnames', mask_fnames),
                          ('mask2real_fname', mask2real), ('mask2fake_fname', mask2fake),
                          ('real_scores', real_scores), ('fake_scores', fake_scores)]:
            with open(os.path.join(latents_dir, f'{name}.pkl'), 'wb') as f:
                pickle.dump(obj, f, protocol=3)
    else:
        def load(name):
            with open(os.path.join(latents_dir, f'{name}.pkl'), 'rb') as f:
                return pickle.load(f)
        orig_fnames, mask_fnames = load('orig_fnames'), load('mask_fnames')
        mask2real, mask2fake = load('mask2real_fname'), load('mask2fake_fname')
        real_scores, fake_scores = load('real_scores'), load('fake_scores')

    real_info = pd.DataFrame([dict(real_fname=f, real_score=s)
                              for f, s in zip(orig_fnames, real_scores)])
    real_info = real_info.drop_duplicates('real_fname').set_index('real_fname')
    fake_info = pd.DataFrame([dict(mask_fname=f, fake_fname=mask2fake[f],
                                   real_fname=mask2real[f], fake_score=s)
                              for f, s in zip(mask_fnames, fake_scores)])
    fake_info = fake_info.join(real_info, on='real_fname', how='left')
    fake_info.drop_duplicates(['fake_fname', 'real_fname'], inplace=True)
    fake_info.to_csv(os.path.join(latents_dir, 'join_scores_table.csv'),
                     sep='\t', index=False)

    fake_scores_table = fake_info.set_index('mask_fname')['fake_score'].to_frame()
    real_scores_table = real_info

    take_top = int(config.get('take_global_top', 30))
    worst = fake_info.sort_values('fake_score')['mask_fname'].iloc[:take_top]
    best = fake_info.sort_values('fake_score', ascending=False)['mask_fname'].iloc[:take_top]
    save_global_samples(worst, mask2real, mask2fake, global_worst_dir,
                        real_scores_table, fake_scores_table)
    save_global_samples(best, mask2real, mask2fake, global_best_dir,
                        real_scores_table, fake_scores_table)

    # overlapping-mask sensitivity: score diffs for masks of the same image
    # that overlap strongly (reference analyze_errors.py:85-101,283-300)
    pairs, diffs = [], []
    for real_fname, group in fake_info.groupby('real_fname'):
        names = sorted(group['mask_fname'].unique())
        for i in range(len(names) - 1):
            for j in range(i + 1, len(names)):
                if mask_overlap(names[i], names[j]) > config.get('min_overlap', 0.5):
                    pairs.append((names[i], names[j]))
                    diffs.append(abs(float(fake_scores_table.loc[names[i]]) -
                                     float(fake_scores_table.loc[names[j]])))
    if pairs:
        order = np.argsort(diffs)[::-1]
        with open(os.path.join(args.outpath, 'overlapping_mask_score_diffs.tsv'), 'w') as f:
            for k in order:
                f.write(f'{diffs[k]:.4f}\t{pairs[k][0]}\t{pairs[k][1]}\n')

    print(f'Analysis written to {args.outpath}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('config', help='e.g. configs/analyze_mask_errors.yaml')
    parser.add_argument('datadir')
    parser.add_argument('predictdir')
    parser.add_argument('outpath')
    parser.add_argument('--only-report', action='store_true')
    parser.add_argument('--n-jobs', type=int, default=0)
    parser.add_argument('--device', default=None, choices=[None, 'cpu', 'tpu'])
    main(parser.parse_args())
