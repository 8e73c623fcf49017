#!/usr/bin/env python3
"""Export the inpainting model as a serialized StableHLO artifact — the
TPU-native analogue of reference bin/to_jit.py (TorchScript export):
wraps the model as (image, mask) -> inpainted, exports via jax.export, and
parity-checks the roundtrip like to_jit.py:68-72.

Usage:
  python bin/to_stablehlo.py model.path=<run> outdir=<dir> \
      [height=512] [width=512] [device=cpu]
"""
import logging
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOGGER = logging.getLogger(__name__)


def main(argv):
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from lama_tpu.config import load_yaml, parse_overrides
    from lama_tpu.config.node import ConfigNode, resolve_interpolations
    from lama_tpu.models import make_generator
    from lama_tpu.training.checkpoint import load_generator_variables

    logging.basicConfig(level=logging.INFO, force=True)  # jax pre-configures the root logger
    cfg = ConfigNode({'model': {'path': None, 'checkpoint': 'best'},
                      'outdir': None, 'height': 512, 'width': 512,
                      'device': 'tpu'})
    for k, v in parse_overrides(argv).items():
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
    variables = jax.tree.map(jnp.asarray, variables)

    h, w = int(cfg.height), int(cfg.width)

    def predict(image, mask):
        """(1,H,W,3), (1,H,W,1) in [0,1] -> inpainted (1,H,W,3)."""
        masked = image * (1 - mask)
        x = jnp.concatenate([masked, mask], axis=-1)
        pred = generator.apply(variables, x, train=False)
        return (mask * pred + (1 - mask) * image).astype(jnp.float32)

    exported = jax_export.export(jax.jit(predict))(
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, h, w, 1), jnp.float32))
    blob = exported.serialize()

    os.makedirs(cfg.outdir, exist_ok=True)
    out_path = os.path.join(cfg.outdir, f'inpainter_{h}x{w}.stablehlo')
    with open(out_path, 'wb') as f:
        f.write(blob)
    LOGGER.info(f'Saved {len(blob)} bytes to {out_path}')

    # parity check: deserialize and diff against direct execution (to_jit.py:68-72)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(1, h, w, 1) > 0.8).astype(np.float32))
    restored = jax_export.deserialize(blob)
    out_direct = predict(img, mask)
    out_exported = restored.call(img, mask)
    diff = float(jnp.abs(out_direct - out_exported).max())
    LOGGER.info(f'Export parity max |diff| = {diff:.2e}')
    assert diff < 1e-4, diff


if __name__ == '__main__':
    try:
        main(sys.argv[1:])
    except Exception as ex:
        LOGGER.critical(f'Export failed due to {ex}:\n{traceback.format_exc()}')
        sys.exit(1)
