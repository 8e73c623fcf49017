#!/usr/bin/env python3
"""Export a lama-tpu checkpoint back to a reference-loadable PyTorch .ckpt.

Inverse of the torch->flax conversion path: takes a model dir (config.yaml +
models/<name> orbax pytree, as written by bin/train.py or
bin/make_checkpoint.py) and writes `{'state_dict': {'generator.<k>': ...}}`
that `saicinpainting.training.trainers.load_checkpoint(strict=False)` in the
reference repo (bin/predict.py flow) accepts directly — so models trained on
TPU remain usable by the PyTorch ecosystem. Round-trip parity is tested
against the actual reference torch code (tests/test_export_torch_cli.py).

Usage:
  python bin/export_torch_checkpoint.py <model_dir> <out.ckpt> \
      [--checkpoint best]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    import torch
    import yaml

    from lama_tpu.models import make_generator
    from lama_tpu.training.checkpoint import load_generator_variables
    from lama_tpu.training.convert import flax_to_torch

    with open(os.path.join(args.model_dir, 'config.yaml')) as f:
        config = yaml.safe_load(f)
    gen_kwargs = dict(config['generator'])
    generator = make_generator(gen_kwargs.pop('kind'), **gen_kwargs)

    ckpt = os.path.join(args.model_dir, 'models', args.checkpoint)
    ckpt = os.path.splitext(ckpt)[0]  # accept 'best.ckpt' config naming
    import jax.numpy as jnp
    probe = jnp.zeros((1, 64, 64, int(gen_kwargs.get('input_nc', 4))))
    template = generator.init(jax.random.PRNGKey(0), probe, train=False)
    variables = load_generator_variables(ckpt, template)

    sd = flax_to_torch(variables, model=generator, prefix='generator.')
    state_dict = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in sd.items()}
    # reference BatchNorm carries num_batches_tracked buffers; emit zeros so
    # strict-ish consumers see the full key set
    for k in list(state_dict):
        if k.endswith('.running_mean'):
            state_dict[k[:-len('running_mean')] + 'num_batches_tracked'] = \
                torch.zeros((), dtype=torch.long)
    torch.save({'state_dict': state_dict}, args.out)
    print(f'Wrote {len(state_dict)} tensors to {args.out}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('model_dir')
    parser.add_argument('out')
    parser.add_argument('--checkpoint', default='best')
    parser.add_argument('--device', default='cpu', choices=['cpu', 'default'])
    args = parser.parse_args()
    main(args)
