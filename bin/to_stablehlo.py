#!/usr/bin/env python3
"""Export the inpainting model as a serialized StableHLO artifact — the
TPU-native analogue of reference bin/to_jit.py (TorchScript export):
wraps the model as (image, mask) -> inpainted, exports via jax.export, and
parity-checks the roundtrip like to_jit.py:68-72.

Usage:
  python bin/to_stablehlo.py model.path=<run> outdir=<dir> \
      [height=512] [width=512] [device=cpu] [precision=fp32] \
      [calibration_indir=<image/mask dir>]

`precision` mirrors bin/predict.py: fp32 (default — reference numerics),
bf16, or int8 (quantized conv contractions baked into the exported program;
see ops/quant.py). With precision=int8, `calibration_indir` (a predict-style
image/mask directory) records STATIC activation scales from those images and
bakes them into the artifact — the exported program then carries no dynamic
amax reductions, and the blob consumer needs no calibration step
(serving.calibrate_int8; quality caveats in docs/SERVING.md).
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

    from lama_tpu.config import parse_overrides
    from lama_tpu.config.node import ConfigNode
    from lama_tpu.serving import load_serving_model, make_inpaint_forward

    logging.basicConfig(level=logging.INFO, force=True)  # jax pre-configures the root logger
    cfg = ConfigNode({'model': {'path': None, 'checkpoint': 'best'},
                      'outdir': None, 'height': 512, 'width': 512,
                      'device': 'tpu', 'precision': 'fp32',
                      'quant_zero_pad': False,
                      'spectral_bf16_store': False,
                      's2d_out_head': False,
                      'calibration_indir': None,
                      'calibration_img_suffix': '.png'})
    for k, v in parse_overrides(argv).items():
        cfg.set_path(k, v)
    if str(cfg.device) == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    # SAME loader + forward as bin/predict.py, so the exported program is the
    # served program (incl. the precision=int8 quantized-conv routing, which
    # is a trace-time decision and therefore baked into the artifact)
    generator, variables, _ = load_serving_model(
        cfg.model.path, checkpoint=str(cfg.model.checkpoint),
        precision=str(cfg.precision),
        quant_zero_pad=bool(cfg.get('quant_zero_pad', False)),
        spectral_bf16_store=bool(cfg.get('spectral_bf16_store', False)),
        s2d_out_head=bool(cfg.get('s2d_out_head', False)))
    variables = jax.tree.map(jnp.asarray, variables)

    calib_dir = cfg.get('calibration_indir')
    if calib_dir:
        if str(cfg.precision) != 'int8':
            raise ValueError('calibration_indir requires precision=int8')
        from lama_tpu.data.datasets import make_default_val_dataset
        from lama_tpu.serving import calibrate_int8
        ds = make_default_val_dataset(
            calib_dir if calib_dir.endswith('/') else calib_dir + '/',
            img_suffix=str(cfg.get('calibration_img_suffix') or '.png'),
            pad_out_to_modulo=8)
        ch, cw = int(cfg.height), int(cfg.width)
        pairs = []
        for i in range(len(ds)):
            item = ds[i]
            image = item['image'][:ch, :cw]
            mask = item['mask'][:ch, :cw]
            ph, pw = ch - image.shape[0], cw - image.shape[1]
            if ph or pw:
                image = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode='symmetric')
                mask = np.pad(mask, ((0, ph), (0, pw), (0, 0)), mode='symmetric')
            pairs.append((image[None].astype(np.float32),
                          (mask[None] > 0).astype(np.float32)))
        variables = calibrate_int8(generator, variables, pairs)
        LOGGER.info(f'int8 static scales calibrated on {len(pairs)} image(s) '
                    f'from {calib_dir}')

    h, w = int(cfg.height), int(cfg.width)
    forward = make_inpaint_forward(generator)

    def predict(image, mask):
        """(1,H,W,3), (1,H,W,1) in [0,1] -> inpainted (1,H,W,3)."""
        return forward(variables, image, mask)

    exported = jax_export.export(jax.jit(predict))(
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, h, w, 1), jnp.float32))
    blob = exported.serialize()

    os.makedirs(cfg.outdir, exist_ok=True)
    suffix = '' if str(cfg.precision) == 'fp32' else f'_{cfg.precision}'
    out_path = os.path.join(cfg.outdir, f'inpainter_{h}x{w}{suffix}.stablehlo')
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
    # bf16/int8: eager-vs-compiled fusion can re-round low-precision
    # intermediates, so the bound is one bf16 ulp of [0,1] rather than fp32's
    tol = 1e-4 if str(cfg.precision) == 'fp32' else 2e-2
    assert diff < tol, diff


if __name__ == '__main__':
    try:
        main(sys.argv[1:])
    except Exception as ex:
        LOGGER.critical(f'Export failed due to {ex}:\n{traceback.format_exc()}')
        sys.exit(1)
