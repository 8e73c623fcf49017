#!/usr/bin/env python3
"""Pre-warm the persistent compilation cache for a serving deployment.

Compiles the inpainting forward program for every requested bucket shape ×
batch size so serving processes (bin/predict.py) start warm — through the
axon relay a cold big-lama 512² compile costs ~12 min, warm ~2 min
(BASELINE.md round-3 cold-start table).

Usage:
  python bin/precompile.py model.path=<run_dir> shapes=512x512,768x512 \
      [batch_size=16] [precision=bf16] [refine=false]

`shapes` are post-bucket-padding (H x W). With refine=true, the per-scale
refinement programs for each shape's pyramid are compiled instead.
"""
import logging
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOGGER = logging.getLogger(__name__)


def main(argv):
    import jax
    import jax.numpy as jnp

    from lama_tpu.config import compose, load_yaml
    from lama_tpu.config.node import resolve_interpolations
    from lama_tpu.models import make_generator
    from lama_tpu.training.checkpoint import load_generator_variables
    from lama_tpu.training.convert import load_torch_checkpoint
    from lama_tpu.utils import enable_compilation_cache

    logging.basicConfig(level=logging.INFO, force=True)
    cache_dir = enable_compilation_cache()
    LOGGER.info(f'Compilation cache: {cache_dir}')

    config_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              'configs', 'prediction')
    cfg = compose(config_dir, 'default', argv)
    if str(cfg.get('device', 'tpu')) == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    train_config = load_yaml(os.path.join(cfg.model.path, 'config.yaml'))
    resolve_interpolations(train_config)
    gen_kwargs = dict(train_config.generator)
    kind = gen_kwargs.pop('kind')
    dtype = {'bf16': jnp.bfloat16, 'fp32': jnp.float32}[cfg.get('precision', 'bf16')]
    generator = make_generator(kind, dtype=dtype, **gen_kwargs)

    ckpt = os.path.join(cfg.model.path, 'models', str(cfg.model.checkpoint))
    if not os.path.exists(ckpt) and os.path.isdir(os.path.splitext(ckpt)[0]):
        ckpt = os.path.splitext(ckpt)[0]
    probe = jnp.zeros((1, 64, 64, gen_kwargs.get('input_nc', 4)))
    template = generator.init(jax.random.PRNGKey(0), probe, train=False)
    variables = (load_generator_variables(ckpt, template) if os.path.isdir(ckpt)
                 else load_torch_checkpoint(ckpt, template, generator))

    shapes_arg = cfg.get('shapes', '512x512')
    shapes = [tuple(int(v) for v in s.lower().split('x'))
              for s in str(shapes_arg).split(',') if s]
    batch = int(cfg.get('batch_size', 16))
    use_refine = bool(cfg.get('refine', False))

    def _predict(variables, image, mask):
        masked = image * (1 - mask)
        x = jnp.concatenate([masked, mask], axis=-1)
        pred = generator.apply(variables, x, train=False)
        return (mask * pred + (1 - mask) * image).astype(jnp.float32)

    for h, w in shapes:
        t0 = time.time()
        if use_refine:
            from lama_tpu.evaluation.refinement import refine_predict
            img = jnp.zeros((1, h, w, 3))
            mask = jnp.zeros((1, h, w, 1)).at[:, h // 4:h // 2, w // 4:w // 2].set(1.0)
            out = refine_predict(img, mask, generator, variables,
                                 **dict(cfg.refiner))
            np.asarray(out[..., :1].sum())  # force completion through the relay
            LOGGER.info(f'refine {h}x{w}: compiled+ran in {time.time() - t0:.1f}s')
        else:
            img = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
            msk = jax.ShapeDtypeStruct((batch, h, w, 1), jnp.float32)
            jax.jit(_predict).lower(variables, img, msk).compile()
            LOGGER.info(f'predict {h}x{w} b{batch}: compiled in {time.time() - t0:.1f}s')
    LOGGER.info(f'Pre-warmed {len(shapes)} shape(s).')


if __name__ == '__main__':
    try:
        main(sys.argv[1:])
    except KeyboardInterrupt:
        LOGGER.warning('Interrupted by user')
        sys.exit(1)
    except Exception as ex:
        LOGGER.critical(f'Precompile failed due to {ex}:\n{traceback.format_exc()}')
        sys.exit(1)
