#!/usr/bin/env python3
"""Config-override variant of gen_mask_dataset (analogue of reference
bin/gen_mask_dataset_hydra.py): same generation pipeline, but the data_gen
config is composed with key=value overrides instead of taken verbatim.

Usage:
  python bin/gen_mask_dataset_hydra.py -cn random_medium_512 \
      indir=<images> outdir=<out> [mask_generator_kwargs.variants_n=3] ...
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_name, overrides):
    from lama_tpu.config import compose
    from lama_tpu.config.node import to_dict
    from gen_mask_dataset import main as gen_main

    config_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              'configs', 'data_gen')
    cfg = compose(config_dir, config_name, overrides)
    indir = cfg.pop('indir', None)
    outdir = cfg.pop('outdir', None)
    if not indir or not outdir:
        raise ValueError('indir=<path> and outdir=<path> overrides are required')

    class Args:
        pass

    args = Args()
    args.indir = str(indir)
    args.outdir = str(outdir)
    args.n_jobs = int(cfg.pop('n_jobs', 0))
    args.ext = str(cfg.pop('ext', 'jpg'))
    args.seed = cfg.pop('seed', None)

    import tempfile
    import yaml
    with tempfile.NamedTemporaryFile('w', suffix='.yaml', delete=False) as f:
        yaml.safe_dump(to_dict(cfg), f)
        args.config = f.name
    try:
        gen_main(args)
    finally:
        os.unlink(args.config)


if __name__ == '__main__':
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    parser = argparse.ArgumentParser()
    parser.add_argument('-cn', '--config-name', required=True)
    parser.add_argument('overrides', nargs='*')
    args = parser.parse_args()
    main(args.config_name, args.overrides)
