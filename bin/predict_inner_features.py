#!/usr/bin/env python3
"""Dump L2-norm heatmaps of intermediate generator activations (paper
figures) — analogue of reference bin/predict_inner_features.py.

Uses flax capture_intermediates to collect every model_<i> stage output of
the FFC generator; (local, global) tuples are concatenated channel-wise.

Usage:
  python bin/predict_inner_features.py model.path=<run> indir=<d> outdir=<o> \
      [levels=[1,4,22]] [hole_radius=60] [device=cpu]
"""
import logging
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

LOGGER = logging.getLogger(__name__)


def main(argv):
    import jax
    import jax.numpy as jnp

    from lama_tpu.config import load_yaml, parse_overrides
    from lama_tpu.config.node import ConfigNode, resolve_interpolations
    from lama_tpu.data.datasets import make_default_val_dataset
    from lama_tpu.models import make_generator
    from lama_tpu.training.checkpoint import load_generator_variables

    logging.basicConfig(level=logging.INFO, force=True)  # jax pre-configures the root logger
    overrides = parse_overrides(argv)
    cfg = ConfigNode({'model': {'path': None, 'checkpoint': 'best'},
                      'indir': None, 'outdir': None,
                      'dataset': {'kind': 'default', 'img_suffix': '.png',
                                  'pad_out_to_modulo': 8},
                      'levels': [1, 2, 3, 4], 'hole_radius': 60,
                      'device': 'tpu'})
    for k, v in overrides.items():
        cfg.set_path(k, v)
    if str(cfg.device) == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    train_config = load_yaml(os.path.join(cfg.model.path, 'config.yaml'))
    resolve_interpolations(train_config)
    gen_kwargs = dict(train_config.generator)
    generator = make_generator(gen_kwargs.pop('kind'), **gen_kwargs)
    probe = jnp.zeros((1, 64, 64, gen_kwargs.get('input_nc', 4)))
    template = generator.init(jax.random.PRNGKey(0), probe, train=False)
    ckpt = os.path.join(cfg.model.path, 'models', str(cfg.model.checkpoint))
    if not os.path.exists(ckpt) and os.path.isdir(os.path.splitext(ckpt)[0]):
        ckpt = os.path.splitext(ckpt)[0]
    variables = load_generator_variables(ckpt, template)

    indir = cfg.indir if cfg.indir.endswith('/') else cfg.indir + '/'
    dataset = make_default_val_dataset(indir, **dict(cfg.dataset))
    levels = set(int(l) for l in cfg.levels)

    def forward_with_intermediates(variables, x):
        out, state = generator.apply(
            variables, x, train=False,
            capture_intermediates=lambda mdl, name: mdl.name is not None
            and mdl.name.startswith('model_'))
        return out, state['intermediates']

    for img_i in range(len(dataset)):
        mask_fname = dataset.mask_filenames[img_i]
        cur_out_fname = os.path.join(
            cfg.outdir, os.path.splitext(mask_fname[len(indir):])[0])
        os.makedirs(os.path.dirname(cur_out_fname), exist_ok=True)

        item = dataset[img_i]
        img = jnp.asarray(item['image'][None])
        h, w = img.shape[1:3]
        mask = np.zeros((1, h, w, 1), np.float32)
        r = int(cfg.hole_radius)
        mask[:, h // 2 - r:h // 2 + r, w // 2 - r:w // 2 + r] = 1
        x = jnp.concatenate([img * (1 - mask), jnp.asarray(mask)], axis=-1)

        _, inter = forward_with_intermediates(variables, x)
        for name, value in inter.items():
            level_i = int(name.split('_')[-1])
            if level_i not in levels:
                continue
            feats = value['__call__'][0]
            if isinstance(feats, tuple):
                feats = jnp.concatenate([f for f in feats if f is not None], axis=-1)
            heat = np.asarray(jnp.sqrt(jnp.mean(jnp.square(
                feats.astype(jnp.float32)), axis=-1)))[0]
            heat = heat - heat.min()
            heat = heat / (heat.std() + 1e-8)
            heat = np.clip(heat, 0, 1) * 255
            cv2.imwrite(cur_out_fname + f'_lev{level_i:02d}_norm.png',
                        heat.astype('uint8'))
    LOGGER.info(f'Inner feature maps written to {cfg.outdir}')


if __name__ == '__main__':
    try:
        main(sys.argv[1:])
    except Exception as ex:
        LOGGER.critical(f'Failed due to {ex}:\n{traceback.format_exc()}')
        sys.exit(1)
