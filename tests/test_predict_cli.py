"""End-to-end predict CLI test: fake model dir (config + orbax ckpt) +
synthetic image/mask pairs -> inpainted PNGs, known region preserved."""
import os
import sys

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from lama_tpu.data.io import load_image, save_image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'bin'))

TINY_GEN_CFG = dict(
    kind='ffc_resnet', input_nc=4, output_nc=3, ngf=8, n_downsampling=2,
    n_blocks=2, add_out_act='sigmoid',
    init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False),
)


def make_model_dir(tmp_path):
    model_dir = tmp_path / 'model'
    (model_dir / 'models').mkdir(parents=True)
    with open(model_dir / 'config.yaml', 'w') as f:
        yaml.safe_dump({'generator': TINY_GEN_CFG, 'training_model': {'kind': 'default'}}, f)

    from lama_tpu.models import make_generator
    from lama_tpu.training.checkpoint import save_pytree
    kw = dict(TINY_GEN_CFG)
    gen = make_generator(kw.pop('kind'), **kw)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)), train=False)
    save_pytree(str(model_dir / 'models' / 'best'), variables)
    return model_dir


def test_predict_cli_end_to_end(tmp_path, rng):
    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'data'
    outdir = tmp_path / 'out'
    indir.mkdir()
    shapes = [(50, 70), (64, 64)]
    for i, (h, w) in enumerate(shapes):
        img = rng.rand(h, w, 3).astype(np.float32)
        mask = np.zeros((h, w, 1), np.float32)
        mask[h // 4: h // 2, w // 4: w // 2] = 1.0
        save_image(str(indir / f'scene{i}.png'), img)
        save_image(str(indir / f'scene{i}_mask.png'), mask)

    import predict as predict_cli
    predict_cli.main([f'model.path={model_dir}', f'indir={indir}', f'outdir={outdir}',
                      'dataset.img_suffix=.png', 'precision=fp32'])

    for i, (h, w) in enumerate(shapes):
        out_path = outdir / f'scene{i}_mask.png'
        assert out_path.exists(), list(outdir.iterdir())
        out = load_image(str(out_path))
        assert out.shape == (h, w, 3)
        img = load_image(str(indir / f'scene{i}.png'))
        mask = load_image(str(indir / f'scene{i}_mask.png'))[..., :1]
        # known region preserved (composite), hole actually repainted
        known = (mask[..., 0] == 0)
        np.testing.assert_allclose(out[known], img[known], atol=2 / 255)
        assert np.abs(out[~known] - img[~known]).max() > 0.02


def test_predict_cli_batched_matches_batch1(tmp_path, rng):
    """batch_size>1 groups same-bucket images into one program; outputs must
    be identical to the batch-1 path (incl. the repeat-padded short group)."""
    import subprocess
    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'in'
    indir.mkdir()
    for i in range(3):  # 3 images, batch_size=2 -> one full + one short group
        img = (rng.rand(72, 88, 3) * 255).astype(np.uint8)
        mask = np.zeros((72, 88), np.uint8)
        mask[20:40, 30:60] = 255
        save_image(str(indir / f'img{i}.png'), img / 255.0)
        save_image(str(indir / f'img{i}_mask001.png'),
                   mask[..., None] / 255.0)

    env = dict(os.environ, JAX_PLATFORMS='cpu')
    outs = {}
    for bs in (1, 2):
        outdir = tmp_path / f'out_bs{bs}'
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, 'bin', 'predict.py'),
             f'model.path={tmp_path / "model"}', f'indir={indir}',
             f'outdir={outdir}', 'device=cpu', f'batch_size={bs}'],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
        assert res.returncode == 0, res.stderr[-2000:]
        outs[bs] = [load_image(str(outdir / f'img{i}_mask001.png'))
                    for i in range(3)]
    for a, b in zip(outs[1], outs[2]):
        np.testing.assert_array_equal(a, b)


def test_predict_cli_out_key_predicted_image(tmp_path, rng):
    """out_key=predicted_image serves the raw generator output over the full
    frame (reference bin/predict.py:86 indexes batch[out_key]; keys built in
    trainers/default.py:70-71) — no known-pixel composite; inside the hole it
    matches the default inpainted output exactly."""
    import predict as predict_cli
    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'in'
    indir.mkdir()
    img = rng.rand(64, 64, 3).astype(np.float32)
    mask = np.zeros((64, 64, 1), np.float32)
    mask[16:40, 16:40] = 1.0
    save_image(str(indir / 'a.png'), img)
    save_image(str(indir / 'a_mask.png'), mask)

    outs = {}
    for key in ('inpainted', 'predicted_image'):
        outdir = tmp_path / f'out_{key}'
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={outdir}', 'device=cpu',
                          'precision=fp32', f'out_key={key}'])
        outs[key] = load_image(str(outdir / 'a_mask.png'))
    known = mask[..., 0] == 0
    hole = ~known
    np.testing.assert_array_equal(outs['inpainted'][hole],
                                  outs['predicted_image'][hole])
    src = load_image(str(indir / 'a.png'))
    np.testing.assert_allclose(outs['inpainted'][known], src[known],
                               atol=2 / 255)
    # raw prediction: the known region is repainted, not composited
    assert np.abs(outs['predicted_image'][known] - src[known]).max() > 0.02

    with pytest.raises(ValueError, match='out_key'):
        from lama_tpu.serving import make_inpaint_forward
        make_inpaint_forward(object(), out_key='nope')


def test_predict_cli_pipeline_depth_bit_equal(tmp_path, rng):
    """pipeline_depth keeps dispatched batches in flight (async overlap of
    host I/O with device compute); written PNGs must be bit-equal to the
    synchronous depth=1 path, including the drain of the final short group."""
    import predict as predict_cli
    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'in'
    indir.mkdir()
    for i in range(5):  # batch 2 -> two full groups + one short, drained last
        img = rng.rand(64, 64, 3).astype(np.float32)
        mask = np.zeros((64, 64, 1), np.float32)
        mask[16:40, 16:40] = 1.0
        save_image(str(indir / f'img{i}.png'), img)
        save_image(str(indir / f'img{i}_mask.png'), mask)

    outs = {}
    for depth in (1, 4):
        outdir = tmp_path / f'out_d{depth}'
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={outdir}', 'device=cpu', 'batch_size=2',
                          f'pipeline_depth={depth}'])
        outs[depth] = [load_image(str(outdir / f'img{i}_mask.png'))
                       for i in range(5)]
    for a, b in zip(outs[1], outs[4]):
        np.testing.assert_array_equal(a, b)


def test_predict_cli_uint8_wire_bit_equal(tmp_path, rng):
    """wire=uint8 transfers uint8 both ways; for 8-bit-sourced un-resized
    inputs the written PNGs must be BIT-EQUAL to the fp32 wire's: uint8/255
    reproduces the loader's floats exactly, and the device applies
    save_image's own clip*255-truncate map (floor == truncation >= 0)."""
    import subprocess
    make_model_dir(tmp_path)
    indir = tmp_path / 'in'
    indir.mkdir()
    for i in range(3):  # batch_size=2 -> one full group + one repeat-padded
        img = (rng.rand(72, 88, 3) * 255).astype(np.uint8)
        mask = np.zeros((72, 88), np.uint8)
        mask[20:40, 30:60] = 255
        save_image(str(indir / f'img{i}.png'), img / 255.0)
        save_image(str(indir / f'img{i}_mask001.png'), mask[..., None] / 255.0)

    env = dict(os.environ, JAX_PLATFORMS='cpu')
    outs = {}
    for wire in ('fp32', 'uint8'):
        outdir = tmp_path / f'out_{wire}'
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, 'bin', 'predict.py'),
             f'model.path={tmp_path / "model"}', f'indir={indir}',
             f'outdir={outdir}', 'device=cpu', 'batch_size=2', f'wire={wire}'],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
        assert res.returncode == 0, res.stderr[-2000:]
        outs[wire] = [np.asarray(load_image(str(outdir / f'img{i}_mask001.png')))
                      for i in range(3)]
    for a, b in zip(outs['fp32'], outs['uint8']):
        np.testing.assert_array_equal(a, b)


def test_predict_cli_spatial_shards(tmp_path, rng):
    """spatial_shards=2 shards the image H axis over the virtual CPU mesh;
    output must match the unsharded run."""
    import subprocess
    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'in'
    indir.mkdir()
    img = (rng.rand(72, 88, 3) * 255).astype(np.uint8)
    mask = np.zeros((72, 88), np.uint8)
    mask[20:40, 30:60] = 255
    save_image(str(indir / 'img0.png'), img / 255.0)
    save_image(str(indir / 'img0_mask001.png'), mask[..., None] / 255.0)

    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS=os.environ.get('XLA_FLAGS', '')
               + ' --xla_force_host_platform_device_count=2')
    outs = {}
    # (shards, wire): the uint8 wire must compose with the (data, space)
    # mesh — uint8 arrays shard and dequantize on device like fp32 ones
    for shards, wire in ((0, 'fp32'), (2, 'fp32'), (2, 'uint8')):
        outdir = tmp_path / f'out_s{shards}_{wire}'
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, 'bin', 'predict.py'),
             f'model.path={tmp_path / "model"}', f'indir={indir}',
             f'outdir={outdir}', 'device=cpu', f'spatial_shards={shards}',
             f'wire={wire}'],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
        assert res.returncode == 0, res.stderr[-2000:]
        outs[shards, wire] = load_image(str(outdir / 'img0_mask001.png'))
    np.testing.assert_allclose(outs[2, 'fp32'], outs[0, 'fp32'], atol=2e-2)
    np.testing.assert_array_equal(outs[2, 'uint8'], outs[2, 'fp32'])


def test_predict_cli_refine_with_spatial_shards(tmp_path, rng):
    """refine=true composes with spatial_shards (round 3): the per-scale Adam
    refinement runs over the (data, space) mesh and must match the unsharded
    refine output."""
    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'data'
    indir.mkdir()
    h, w = 72, 64
    img = rng.rand(h, w, 3).astype(np.float32)
    mask = np.zeros((h, w, 1), np.float32)
    mask[20:44, 16:48] = 1.0
    save_image(str(indir / 'scene.png'), img)
    save_image(str(indir / 'scene_mask.png'), mask)

    import predict as predict_cli
    refiner = ('refiner.n_iters=2', 'refiner.min_side=32',
               'refiner.max_scales=2', 'refiner.px_budget=1000000000')
    out_plain = tmp_path / 'out_plain'
    predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                      f'outdir={out_plain}', 'dataset.img_suffix=.png',
                      'device=cpu', 'refine=true', 'precision=fp32', *refiner])
    out_sharded = tmp_path / 'out_sharded'
    predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                      f'outdir={out_sharded}', 'dataset.img_suffix=.png',
                      'device=cpu', 'refine=true', 'precision=fp32',
                      'spatial_shards=4', *refiner])

    a = load_image(str(out_plain / 'scene_mask.png'))
    b = load_image(str(out_sharded / 'scene_mask.png'))
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, atol=2 / 255)


def test_predict_cli_spectral_bf16_store(tmp_path, rng):
    """spectral_bf16_store=true (the round-4 +9.5% serving lever): CLI runs
    end to end, known region preserved, hole output close to the plain int8
    serve; the mode is per-generator (tests/test_spectral.py covers the
    loader threading)."""
    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'data'
    indir.mkdir()
    img = rng.rand(64, 64, 3).astype(np.float32)
    mask = np.zeros((64, 64, 1), np.float32)
    mask[16:40, 16:40] = 1.0
    save_image(str(indir / 'a.png'), img)
    save_image(str(indir / 'a_mask.png'), mask)

    import predict as predict_cli
    outs = {}
    for tag, extra in (('plain', []),
                       ('bf16store', ['spectral_bf16_store=true'])):
        outdir = tmp_path / f'out_{tag}'
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={outdir}', 'dataset.img_suffix=.png',
                          'precision=int8'] + extra)
        outs[tag] = load_image(str(outdir / 'a_mask.png'))
    known = mask[..., 0] == 0
    np.testing.assert_allclose(outs['bf16store'][known], img[known],
                               atol=2 / 255)
    # bf16 store drift vs the plain int8 serve stays small on a tiny model
    assert np.abs(outs['bf16store'].astype(np.float32)
                  - outs['plain'].astype(np.float32)).max() < 0.1


def test_predict_cli_uint8_wire_composes_with_int8_headline(tmp_path, rng):
    """The full deployment stack composed: wire=uint8 + precision=int8 +
    quant_zero_pad + quant_calibration + spectral_bf16_store. The wire is a
    transfer format — outputs must stay BIT-EQUAL to the fp32 wire under the
    SAME serving mode (8-bit-sourced un-resized inputs)."""
    import subprocess
    make_model_dir(tmp_path)
    indir = tmp_path / 'in'
    indir.mkdir()
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[20:40, 24:48] = 255
    save_image(str(indir / 'img_mask001.png'), mask[..., None] / 255.0)
    save_image(str(indir / 'img.png'), img / 255.0)

    env = dict(os.environ, JAX_PLATFORMS='cpu')
    mode = ['precision=int8', 'quant_zero_pad=true', 'quant_calibration=1',
            'spectral_bf16_store=true']
    outs = {}
    for wire in ('fp32', 'uint8'):
        outdir = tmp_path / f'out_{wire}'
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, 'bin', 'predict.py'),
             f'model.path={tmp_path / "model"}', f'indir={indir}',
             f'outdir={outdir}', 'device=cpu', f'wire={wire}'] + mode,
            capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
        assert res.returncode == 0, res.stderr[-2000:]
        outs[wire] = np.asarray(load_image(str(outdir / 'img_mask001.png')))
    np.testing.assert_array_equal(outs['fp32'], outs['uint8'])
    known = mask == 0
    np.testing.assert_allclose(outs['uint8'][known], (img / 255.0)[known],
                               atol=2 / 255)
