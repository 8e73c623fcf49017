#!/usr/bin/env python3
"""Inpainting inference CLI — the analogue of reference bin/predict.py.

Usage:
  python bin/predict.py model.path=<run_dir> indir=<images+masks> outdir=<out> \
      [dataset.img_suffix=.png] [refine=true] [model.checkpoint=best]

Model dir layout (produced by bin/train.py / bin/make_checkpoint.py):
  <run_dir>/config.yaml            frozen train config
  <run_dir>/models/<checkpoint>    orbax generator export (or full TrainState)
Also accepts reference PyTorch deployment checkpoints (*.ckpt / *.pth) via the
torch->flax converter.

TPU-first behaviour vs the reference:
- batched jitted forward; shapes are padded to `dataset.pad_out_to_modulo`
  and additionally bucketed (pad_to_bucket) so XLA compiles a handful of
  programs instead of one per image size;
- runs on the default JAX device (TPU), bf16 conv path, fp32 spectral path.
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

    from lama_tpu.config import compose
    from lama_tpu.data.datasets import make_default_val_dataset
    from lama_tpu.data.io import save_image
    from lama_tpu.serving import (bucket_shape, load_serving_model,
                                  make_inpaint_forward)
    from lama_tpu.utils import enable_compilation_cache, register_debug_signal_handlers

    logging.basicConfig(level=logging.INFO, force=True)  # jax pre-configures the root logger
    register_debug_signal_handlers()
    enable_compilation_cache()

    config_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              'configs', 'prediction')
    predict_config = compose(config_dir, 'default', argv)

    # device: tpu (default platform) | cpu — useful for smoke runs without a chip
    if str(predict_config.get('device', 'tpu')) == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    model_path = predict_config.model.path
    if not isinstance(model_path, str) or model_path in ('', 'no'):
        raise ValueError('model.path must be given (model.path=<run dir>)')
    for key in ('indir', 'outdir'):
        if not isinstance(predict_config.get(key), str):
            raise ValueError(f'{key} must be given ({key}=<path>)')
    if (bool(predict_config.get('refine', False))
            and str(predict_config.get('precision', 'bf16')) == 'int8'):
        # refinement optimizes features by gradient THROUGH the rear of the
        # generator; the int8 path's round() has zero gradient, which would
        # silently turn the Adam loop into a no-op
        raise ValueError('refine=true is incompatible with precision=int8 '
                         '(quantization blocks the refinement gradients); '
                         'use precision=bf16 or fp32')
    generator, variables, gen_kwargs = load_serving_model(
        model_path, checkpoint=str(predict_config.model.checkpoint),
        precision=predict_config.get('precision', 'bf16'),
        quant_zero_pad=bool(predict_config.get('quant_zero_pad', False)),
        spectral_bf16_store=bool(predict_config.get('spectral_bf16_store',
                                                    False)),
        s2d_out_head=bool(predict_config.get('s2d_out_head', False)),
        xfold_stem=bool(predict_config.get('xfold_stem', False)))

    out_ext = predict_config.get('out_ext', '.png')
    modulo = predict_config.dataset.pad_out_to_modulo
    bucket = int(predict_config.get('pad_to_bucket', 64))

    if not predict_config.indir.endswith('/'):
        predict_config['indir'] = predict_config.indir + '/'
    dataset = make_default_val_dataset(predict_config.indir, **dict(predict_config.dataset))

    # spatial_shards=N splits the image H axis over N devices — the >HBM
    # resolution serving path (2-D mesh; GSPMD inserts the conv halo
    # exchanges and DFT collectives). Requires N local devices and H % N == 0
    # after bucket padding; bucket is rounded up accordingly below.
    spatial = int(predict_config.get('spatial_shards', 0) or 0)
    mesh = None
    if spatial > 1:
        from lama_tpu.parallel.mesh import make_mesh
        if len(jax.devices()) < spatial:
            raise ValueError(f'spatial_shards={spatial} needs that many '
                             f'devices; have {len(jax.devices())}')
        mesh = make_mesh(('data', 'space'), shape=(1, spatial),
                         devices=jax.devices()[:spatial])

    # quant_calibration=K (int8 only): record static activation scales from
    # the first K served images (serving.calibrate_int8) — drops the dynamic
    # per-conv amax reduction from every subsequent batch. 0 (default) =
    # dynamic scales. With spatial_shards>1 the calibration forward runs
    # under the SAME mesh as serving (a >HBM calibration image never lands
    # unsharded on one device).
    calib_n = int(predict_config.get('quant_calibration', 0) or 0)
    if calib_n > 0:
        if str(predict_config.get('precision', 'bf16')) != 'int8':
            raise ValueError('quant_calibration requires precision=int8')
        from lama_tpu.serving import calibrate_int8
        pairs = []
        for i in range(min(calib_n, len(dataset))):
            item = dataset[i]
            image, mask = item['image'], item['mask']
            bh, bw = bucket_shape(image.shape[0], image.shape[1], modulo,
                                  bucket, spatial_shards=spatial)
            ph, pw = bh - image.shape[0], bw - image.shape[1]
            if ph or pw:
                image = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode='symmetric')
                mask = np.pad(mask, ((0, ph), (0, pw), (0, 0)), mode='symmetric')
            pairs.append((image[None].astype(np.float32),
                          (mask[None] > 0).astype(np.float32)))
        variables = calibrate_int8(generator, variables, pairs, mesh=mesh)
        if 'quant_stats' in variables:
            LOGGER.info(f'int8 static scales calibrated on {len(pairs)} image(s)')
        else:
            LOGGER.info('quant_calibration: no int8-eligible convs in this '
                        'model; serving with dynamic scales')

    # wire=uint8: transfer uint8 images/masks up and uint8 results down
    # (8-bit files are the end product anyway — the device applies the same
    # clip/truncate map save_image would; see serving.make_inpaint_forward).
    # On transfer-bound links this is the serving-throughput lever: 66 MB ->
    # 17 MB up + 50 MB -> 12.5 MB down per 512² b16 batch. fp32 (default) =
    # reference wire dtypes.
    wire = str(predict_config.get('wire', 'fp32'))
    _predict = make_inpaint_forward(
        generator, wire=wire, out_key=str(predict_config.get('out_key', 'inpainted')))

    if spatial > 1:
        from lama_tpu.parallel.mesh import shard_predict
        sharded_fn, img_sharding, repl = shard_predict(_predict, mesh)
        variables = jax.device_put(variables, repl)

        def predict_fn(variables, image, mask):
            image = jax.device_put(image, img_sharding)
            mask = jax.device_put(mask, img_sharding)
            return sharded_fn(variables, image, mask)
    else:
        # pin the weights on device ONCE — host-numpy variables would be
        # re-uploaded on every jitted call (~108 MB/batch for big-lama;
        # ruinous on transfer-bound links, see BASELINE.md relay bandwidth)
        variables = jax.device_put(variables)
        predict_fn = jax.jit(_predict)

    use_refine = bool(predict_config.get('refine', False))
    if use_refine:
        from lama_tpu.evaluation.refinement import refine_predict

    # batch_size > 1 (throughput serving): images are grouped by their
    # bucketed shape and run through ONE jitted program per (shape, batch)
    # — the reference is strictly batch-1 (predict.py:67-94). Short final
    # groups are padded by repeating the last item so the program count
    # stays one per bucket shape. Refine mode stays batch-1 (per-image
    # pyramid geometry).
    batch_size = 1 if use_refine else max(1, int(predict_config.get('batch_size', 1)))
    groups = {}

    # pipeline_depth: jax dispatch is asynchronous, so keeping up to N-1
    # batches in flight overlaps the host work (disk reads, bucket padding,
    # PNG encodes) with device compute — the fetch (np.asarray) of batch k
    # happens only after batch k+1 is dispatched. Depth 1 = the synchronous
    # reference behaviour; results are bit-identical either way (tested).
    depth = max(1, int(predict_config.get('pipeline_depth', 2)))
    in_flight = []  # [(entries, device_out)]

    def drain(count=0):
        while len(in_flight) > count:
            entries, out_dev = in_flight.pop(0)
            out = np.asarray(out_dev)
            for e, res in zip(entries, out[:len(entries)]):
                save_image(e['out_fname'], res[:e['orig_h'], :e['orig_w']])

    def flush(entries):
        n = len(entries)
        imgs = [e['image'] for e in entries]
        masks = [e['mask'] for e in entries]
        if n < batch_size:  # pad with repeats; extras dropped after predict
            imgs = imgs + [imgs[-1]] * (batch_size - n)
            masks = masks + [masks[-1]] * (batch_size - n)
        if wire == 'uint8':  # rint inverts the loader's /255 for 8-bit sources
            img_arr = np.rint(np.stack(imgs) * 255.0).astype(np.uint8)
            mask_arr = (np.stack(masks) > 0).astype(np.uint8)
        else:
            img_arr = np.stack(imgs)
            mask_arr = (np.stack(masks) > 0).astype(np.float32)
        out_dev = predict_fn(
            variables, jnp.asarray(img_arr), jnp.asarray(mask_arr))
        in_flight.append((entries[:n], out_dev))
        drain(depth - 1)

    for img_i in range(len(dataset)):
        mask_fname = dataset.mask_filenames[img_i]
        cur_out_fname = os.path.join(
            predict_config.outdir,
            os.path.splitext(mask_fname[len(predict_config.indir):])[0] + out_ext)
        os.makedirs(os.path.dirname(cur_out_fname), exist_ok=True)

        item = dataset[img_i]
        image, mask = item['image'], item['mask']
        orig_h, orig_w = (item['unpad_to_size'] if 'unpad_to_size' in item
                          else image.shape[:2])

        # bucket-pad so XLA reuses compiled programs across similar sizes
        # (shared shape contract with bin/precompile.py: serving.bucket_shape;
        # image.shape is already modulo-padded by the dataset — idempotent)
        bh, bw = bucket_shape(image.shape[0], image.shape[1], modulo, bucket,
                              spatial_shards=spatial)
        pad_h, pad_w = bh - image.shape[0], bw - image.shape[1]
        if pad_h or pad_w:
            image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode='symmetric')
            mask = np.pad(mask, ((0, pad_h), (0, pad_w), (0, 0)), mode='symmetric')

        if use_refine:
            batch_img = jnp.asarray(image[None])
            batch_mask = jnp.asarray((mask[None] > 0).astype(np.float32))
            res = refine_predict(batch_img, batch_mask, generator, variables,
                                 unpad_to_size=(int(orig_h), int(orig_w)),
                                 mesh=mesh if spatial > 1 else None,
                                 **dict(predict_config.refiner))
            res = np.asarray(res[0])
            orig_h, orig_w = res.shape[:2]  # refiner may rescale under px_budget
            save_image(cur_out_fname, res[:orig_h, :orig_w])
            continue

        entry = dict(image=image, mask=mask, out_fname=cur_out_fname,
                     orig_h=int(orig_h), orig_w=int(orig_w))
        if batch_size == 1:
            flush([entry])
        else:
            pending = groups.setdefault((bh, bw), [])
            pending.append(entry)
            if len(pending) >= batch_size:
                flush(pending)
                pending.clear()

    for pending in groups.values():
        if pending:
            flush(pending)
    drain()

    LOGGER.info(f'Predicted {len(dataset)} images to {predict_config.outdir}')


if __name__ == '__main__':
    try:
        main(sys.argv[1:])
    except KeyboardInterrupt:
        LOGGER.warning('Interrupted by user')
        sys.exit(1)
    except Exception as ex:
        LOGGER.critical(f'Prediction failed due to {ex}:\n{traceback.format_exc()}')
        sys.exit(1)
