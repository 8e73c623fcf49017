#!/usr/bin/env python3
"""Pre-warm the persistent compilation cache for a serving deployment.

Compiles the inpainting forward program for every requested bucket shape ×
batch size so serving processes (bin/predict.py) start warm — through the
axon relay a cold big-lama 512² compile costs ~12 min, warm ~2 min
(BASELINE.md round-3 cold-start table).

Usage:
  python bin/precompile.py model.path=<run_dir> shapes=512x512,768x512 \
      [batch_size=16] [precision=bf16] [refine=false]

`shapes` are ORIGINAL image sizes (H x W). For the plain forward they are
bucket-padded exactly as bin/predict.py pads (pad_to_bucket, default 64);
with refine=true, the per-scale refinement programs for that original size's
pyramid are compiled instead (the pyramid geometry depends on the original
size, not the padded one).
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

    from lama_tpu.config import compose
    from lama_tpu.serving import (bucket_shape, load_serving_model,
                                  make_inpaint_forward)
    from lama_tpu.utils import enable_compilation_cache

    logging.basicConfig(level=logging.INFO, force=True)
    cache_dir = enable_compilation_cache()
    LOGGER.info(f'Compilation cache: {cache_dir}')

    config_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              'configs', 'prediction')
    cfg = compose(config_dir, 'default', argv)
    if str(cfg.get('device', 'tpu')) == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    # SAME loader + forward as bin/predict.py (lama_tpu/serving.py) — the
    # warmed HLO must be byte-identical to what serving compiles
    generator, variables, _ = load_serving_model(
        cfg.model.path, checkpoint=str(cfg.model.checkpoint),
        precision=cfg.get('precision', 'bf16'),
        quant_zero_pad=bool(cfg.get('quant_zero_pad', False)),
        spectral_bf16_store=bool(cfg.get('spectral_bf16_store', False)),
        s2d_out_head=bool(cfg.get('s2d_out_head', False)),
        xfold_stem=bool(cfg.get('xfold_stem', False)))
    wire = str(cfg.get('wire', 'fp32'))
    _predict = make_inpaint_forward(
        generator, wire=wire, out_key=str(cfg.get('out_key', 'inpainted')))

    shapes_arg = cfg.get('shapes', '512x512')
    shapes = [tuple(int(v) for v in s.lower().split('x'))
              for s in str(shapes_arg).split(',') if s]
    batch = int(cfg.get('batch_size', 16))
    use_refine = bool(cfg.get('refine', False))
    modulo = int(cfg.dataset.pad_out_to_modulo)
    bucket = int(cfg.get('pad_to_bucket', 64))

    # spatial_shards>1 serving uses a DIFFERENT program (GSPMD-sharded over
    # the (data, space) mesh) — warm that one with the same mesh as
    # bin/predict.py builds; requires the same device count as serving will
    spatial = int(cfg.get('spatial_shards', 0) or 0)
    mesh = None
    if spatial > 1 and not use_refine:
        from lama_tpu.parallel.mesh import make_mesh
        if len(jax.devices()) < spatial:
            raise ValueError(f'spatial_shards={spatial} needs that many '
                             f'devices; have {len(jax.devices())}')
        mesh = make_mesh(('data', 'space'), shape=(1, spatial),
                         devices=jax.devices()[:spatial])

    # quant_calibration>0 serving uses a DIFFERENT program (static scalar
    # scales instead of per-conv amax reductions) and runs a batch-1
    # calibration forward per image shape at startup — warm both: run the
    # calibration on zeros (values don't key the compiled program; the
    # quant_stats tree structure does) and lower the serving fn with the
    # merged variables below. Each shape calibrates from the PRISTINE
    # pre-calibration variables — bin/predict.py's cold calibration traces
    # without quant_stats in its input tree, so feeding already-merged
    # variables back in would warm a program serving never compiles.
    calib_n = int(cfg.get('quant_calibration', 0) or 0)
    if calib_n > 0:
        if str(cfg.get('precision', 'bf16')) != 'int8':
            raise ValueError('quant_calibration requires precision=int8')
        from lama_tpu.serving import calibrate_int8
        pristine, merged = variables, None
        for h, w in shapes:
            t0 = time.time()
            bh, bw = bucket_shape(h, w, modulo, bucket, spatial_shards=spatial)
            cal = calibrate_int8(
                generator, pristine,
                [(np.zeros((1, bh, bw, 3), np.float32),
                  np.zeros((1, bh, bw, 1), np.float32))], mesh=mesh)
            if 'quant_stats' in cal:
                merged = cal['quant_stats'] if merged is None else \
                    jax.tree_util.tree_map(np.maximum, merged,
                                           cal['quant_stats'])
            LOGGER.info(f'int8 calibration program {bh}x{bw}: '
                        f'{time.time() - t0:.1f}s')
        if merged is not None:
            variables = {**pristine, 'quant_stats': merged}

    if spatial > 1 and not use_refine:
        from lama_tpu.parallel.mesh import shard_predict
        sharded_fn, img_sharding, repl = shard_predict(_predict, mesh)
        variables = jax.device_put(variables, repl)

    for h, w in shapes:
        t0 = time.time()
        if use_refine:
            # mirror predict.py's refine path: the image arrives
            # modulo+bucket-padded but the pyramid is built from the ORIGINAL
            # size via unpad_to_size, so both key the compiled programs
            from lama_tpu.evaluation.refinement import refine_predict
            ph, pw = bucket_shape(h, w, modulo, bucket)
            img = jnp.zeros((1, ph, pw, 3))
            mask = jnp.zeros((1, ph, pw, 1)).at[:, h // 4:h // 2, w // 4:w // 2].set(1.0)
            out = refine_predict(img, mask, generator, variables,
                                 unpad_to_size=(h, w), **dict(cfg.refiner))
            np.asarray(out[..., :1].sum())  # force completion through the relay
            LOGGER.info(f'refine {h}x{w}: compiled+ran in {time.time() - t0:.1f}s')
        else:
            bh, bw = bucket_shape(h, w, modulo, bucket, spatial_shards=spatial)
            in_dt = jnp.uint8 if wire == 'uint8' else jnp.float32
            img = jax.ShapeDtypeStruct((batch, bh, bw, 3), in_dt)
            msk = jax.ShapeDtypeStruct((batch, bh, bw, 1), in_dt)
            fn = sharded_fn if spatial > 1 else jax.jit(_predict)
            fn.lower(variables, img, msk).compile()
            LOGGER.info(f'predict {h}x{w} -> bucket {bh}x{bw} b{batch}'
                        + (f' x{spatial} H-shards' if spatial > 1 else '')
                        + f': compiled in {time.time() - t0:.1f}s')

    # metrics=ssim,lpips,fid: warm the evaluation kernels too — the
    # bin/evaluate_predicts.py wall (406-690 s for 24 images, BASELINE.md
    # round 3) is dominated by aux-net trace+compile, not per-image compute.
    # Shapes are the ORIGINAL image sizes (metric kernels see unpadded
    # images); eval_batch mirrors eval2.yaml's evaluator batch (default 8),
    # and the remainder batch (n % eval_batch) compiles separately at serve
    # time, so pass e.g. metrics_batches=8,1 to warm both.
    metrics_arg = cfg.get('metrics', None)
    if metrics_arg:
        from lama_tpu.evaluation.scores import (FIDScore, LPIPSScore,
                                                SSIMScore)
        batches = [int(v) for v in
                   str(cfg.get('metrics_batches', '8')).split(',') if v]
        enabled = [m for m in str(metrics_arg).split(',') if m]
        scores = {}
        for m in enabled:
            scores[m] = {'ssim': SSIMScore, 'lpips': LPIPSScore,
                         'fid': FIDScore}[m]()
        for h, w in shapes:
            for be in batches:
                t0 = time.time()
                a = jax.ShapeDtypeStruct((be, h, w, 3), jnp.float32)
                if 'ssim' in scores:
                    scores['ssim']._fn.lower(a, a).compile()
                if 'lpips' in scores:
                    scores['lpips']._fn.lower(a, a).compile()
                if 'fid' in scores:
                    fid_model = scores['fid'].model
                    fid_model._apply.lower(fid_model.variables, a).compile()
                LOGGER.info(f'metrics {list(scores)} {h}x{w} b{be}: '
                            f'compiled in {time.time() - t0:.1f}s')
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
