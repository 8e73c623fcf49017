"""int8 serving quantization (ops/quant.py): conv-level error bounds,
padding-mode parity, and the precision=int8 serving path end to end."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lama_tpu.ops.conv import conv2d
from lama_tpu.ops.quant import conv_eligible, quantized_conv2d
from lama_tpu.ops.serving_mode import ServingMode

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'bin'))


@pytest.mark.parametrize('padding_mode,stride,dilation,groups', [
    ('zeros', 1, 1, 1),
    ('reflect', 1, 1, 1),
    ('reflect', 2, 1, 1),
    ('zeros', 1, 2, 1),
    ('zeros', 1, 1, 2),
])
def test_quantized_conv2d_close_to_fp32(rng, padding_mode, stride, dilation,
                                        groups):
    x = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 64 // groups, 96) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.randn(96).astype(np.float32) * 0.1)
    ref = conv2d(x, w, bias=b, stride=stride, padding=dilation, dilation=dilation,
                 groups=groups, padding_mode=padding_mode)
    q = quantized_conv2d(x, w, bias=b, stride=stride, padding=dilation,
                         dilation=dilation, groups=groups,
                         padding_mode=padding_mode, out_dtype=jnp.float32)
    assert q.shape == ref.shape and q.dtype == ref.dtype
    # symmetric 8-bit quantization of both operands: ~0.5-1% relative rms
    rel = float(jnp.linalg.norm(q - ref) / (jnp.linalg.norm(ref) + 1e-9))
    assert rel < 0.02, rel


@pytest.mark.parametrize('stride,padding,output_padding', [
    (2, 1, 1),   # big-lama rear upsampling (k3 s2 p1 op1)
    (2, 0, 0),
    (1, 1, 0),
])
def test_quantized_conv_transpose2d_close_to_fp32(rng, stride, padding,
                                                  output_padding):
    from lama_tpu.ops.conv import conv_transpose2d
    from lama_tpu.ops.quant import quantized_conv_transpose2d
    x = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 128, 64) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    ref = conv_transpose2d(x, w, bias=b, stride=stride, padding=padding,
                           output_padding=output_padding)
    q = quantized_conv_transpose2d(x, w, bias=b, stride=stride,
                                   padding=padding,
                                   output_padding=output_padding,
                                   out_dtype=jnp.float32)
    assert q.shape == ref.shape and q.dtype == ref.dtype
    rel = float(jnp.linalg.norm(q - ref) / (jnp.linalg.norm(ref) + 1e-9))
    assert rel < 0.02, rel


def test_conv_eligibility_bounds():
    assert conv_eligible(64, 64, 1, 3, 3)
    assert conv_eligible(128, 64, 2, 1, 1)
    assert not conv_eligible(4, 64, 1, 7, 7)   # stem: stays in compute dtype
    assert not conv_eligible(64, 3, 1, 7, 7)   # out head: 3 channels, no MXU work
    assert not conv_eligible(64, 64, 2, 3, 3)  # 32 per group < MXU tile


def test_spectral_conv_never_quantizes(rng):
    """The FourierUnit's frequency-domain 1x1 conv must stay out of the int8
    path even when eligible by channel count (DC-dominated spectra are
    hostile to per-tensor scales; fp32/bf16 spectral is a repo invariant):
    outputs with ServingMode(int8=True) on/off must be IDENTICAL."""
    from lama_tpu.models.ffc import FourierUnit
    # use_se forces the fallback path whose conv is a Conv2d module (the
    # concat-layout fast path uses a raw lax conv and never quantizes)
    fu = FourierUnit(features=64, use_se=True)
    x = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
    variables = fu.init(jax.random.PRNGKey(0), x, train=False)
    ref = fu.apply(variables, x, train=False)
    fu8 = FourierUnit(features=64, use_se=True, mode=ServingMode(int8=True))
    out = fu8.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_quant_zero_pad_serving(tmp_path, rng):
    """quant_zero_pad=true (round-4 win, +3.1%): the quantized convs zero-pad
    instead of reflect-gathering. Differences vs plain int8 concentrate at
    feature-map borders; known pixels stay bit-exact; requires int8."""
    from test_predict_cli import make_model_dir
    from lama_tpu.data.io import load_image, save_image
    import predict as predict_cli

    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'in'
    indir.mkdir()
    img = rng.rand(64, 64, 3).astype(np.float32)
    mask = np.zeros((64, 64, 1), np.float32)
    mask[0:32, 0:32] = 1.0  # border-touching hole
    save_image(str(indir / 'a.png'), img)
    save_image(str(indir / 'a_mask.png'), mask)

    outs = {}
    for zp in ('false', 'true'):
        outdir = tmp_path / f'out_zp{zp}'
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={outdir}', 'device=cpu', 'precision=int8',
                          f'quant_zero_pad={zp}'])
        outs[zp] = load_image(str(outdir / 'a_mask.png'))
    known = mask[..., 0] == 0
    orig = load_image(str(indir / 'a.png'))
    # composite keeps known pixels regardless of padding semantics
    np.testing.assert_array_equal(outs['true'][known], orig[known])
    # stays close to the reflect-padded int8 serve on a tiny random model
    diff = np.abs(outs['true'].astype(np.float32)
                  - outs['false'].astype(np.float32))
    assert diff.max() <= 0.25 * 255, diff.max()

    # rejected outside int8
    with pytest.raises(ValueError, match='quant_zero_pad'):
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={tmp_path / "rej"}', 'device=cpu',
                          'quant_zero_pad=true'])


def test_spectral_int8_lever(rng):
    """SPECTRAL_INT8 (round-4 measured-quality probe lever): the frequency
    1x1 conv runs on the int8 MXU when serving int8 (ServingMode.int8). OFF
    (default) must be bit-identical to the plain path; ON must stay
    numerically close on a non-adversarial input (the trained-weight PSNR
    gate lives in probes/_t_int8_quality.py)."""
    from lama_tpu.models import ffc as ffc_mod
    from lama_tpu.models.ffc import FourierUnit

    fu = FourierUnit(features=64)
    fu8 = FourierUnit(features=64, mode=ServingMode(int8=True))
    x = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    variables = fu.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(fu.apply(variables, x, train=False))

    off = np.asarray(fu8.apply(variables, x, train=False))
    np.testing.assert_array_equal(off, ref)  # probe flag off: untouched
    ffc_mod.SPECTRAL_INT8 = True
    try:
        on = np.asarray(jax.jit(
            lambda v, x: fu8.apply(v, x, train=False))(variables, x))
        # training path never quantizes, probe flag or not
        tr, _ = fu8.apply(variables, x, train=True,
                          mutable=['batch_stats'])
        assert np.isfinite(np.asarray(tr)).all()
    finally:
        ffc_mod.SPECTRAL_INT8 = False
    rel = float(np.linalg.norm(on - ref) / (np.linalg.norm(ref) + 1e-9))
    assert rel < 0.1, rel  # 8-bit operands over a DC-dominated spectrum


def test_spectral_skip_probe_flag(rng):
    """SPECTRAL_SKIP is probe-only: the generator must still run end to end
    (timing upper bound for the spectral slice) and the flag must not change
    the variable tree."""
    from lama_tpu.models import ffc as ffc_mod
    from lama_tpu.models.ffc import FourierUnit

    fu = FourierUnit(features=32)
    x = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
    variables = fu.init(jax.random.PRNGKey(0), x, train=False)
    ffc_mod.SPECTRAL_SKIP = True
    try:
        out = np.asarray(fu.apply(variables, x, train=False))
    finally:
        ffc_mod.SPECTRAL_SKIP = False
    np.testing.assert_array_equal(out, np.asarray(x))  # identity pass-through


def test_int8_composes_with_spatial_shards(tmp_path, rng):
    """precision=int8 under spatial_shards: the dynamic per-tensor activation
    amax becomes a GSPMD collective over the H-sharded tensor — the global
    max is order-exact, so sharded int8 outputs must bit-match unsharded
    int8 outputs."""
    from test_predict_cli import make_model_dir
    from lama_tpu.data.io import load_image, save_image
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
    for shards in (0, 2):
        outdir = tmp_path / f'out_s{shards}'
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={outdir}', 'device=cpu', 'precision=int8',
                          f'spatial_shards={shards}'])
        outs[shards] = load_image(str(outdir / 'a_mask.png'))
    np.testing.assert_array_equal(outs[0], outs[2])


def test_int8_static_scales_match_dynamic_on_calibration_batch(rng):
    """calibrate_int8 records each eligible conv's input amax; serving the
    SAME batch with the merged 'quant_stats' collection must reproduce the
    dynamic-scale outputs exactly (identical scale values by construction)."""
    from lama_tpu.models.ffc import FFCResNetGenerator
    from lama_tpu.serving import calibrate_int8

    gen = FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=2, n_blocks=1,
        add_out_act='sigmoid', mode=ServingMode(int8=True),
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    mask = jnp.zeros((1, 32, 32, 1), jnp.float32).at[:, 8:24, 8:24].set(1.0)
    x = jnp.concatenate([img * (1 - mask), mask], axis=-1)
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)

    dyn = jax.jit(lambda v, x: gen.apply(v, x, train=False))(variables, x)
    calibrated = calibrate_int8(gen, variables, [(img, mask)])
    assert len(jax.tree_util.tree_leaves(calibrated['quant_stats'])) > 0
    stat = jax.jit(lambda v, x: gen.apply(v, x, train=False))(calibrated, x)
    np.testing.assert_array_equal(np.asarray(dyn, np.float32),
                                  np.asarray(stat, np.float32))


def test_calibrate_int8_under_mesh_matches_unsharded(rng):
    """calibrate_int8(mesh=...) runs the calibration forward GSPMD-sharded
    (the spatial_shards serving path) — amax is sharding-invariant, so the
    recorded quant_stats must equal the unsharded calibration's, and serving
    with them must reproduce the unsharded static-scale outputs."""
    from lama_tpu.models.ffc import FFCResNetGenerator
    from lama_tpu.parallel.mesh import make_mesh
    from lama_tpu.serving import calibrate_int8

    gen = FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=2, n_blocks=1,
        add_out_act='sigmoid', mode=ServingMode(int8=True),
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    mask = jnp.zeros((1, 32, 32, 1), jnp.float32).at[:, 8:24, 8:24].set(1.0)
    x = jnp.concatenate([img * (1 - mask), mask], axis=-1)
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)

    mesh = make_mesh(('data', 'space'), shape=(1, 2), devices=jax.devices()[:2])
    plain = calibrate_int8(gen, variables, [(img, mask)])
    sharded = calibrate_int8(gen, variables, [(img, mask)], mesh=mesh)
    flat_p = jax.tree_util.tree_leaves(plain['quant_stats'])
    flat_s = jax.tree_util.tree_leaves(sharded['quant_stats'])
    assert len(flat_p) == len(flat_s) > 0
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predict_cli_quant_calibration_with_spatial_shards(tmp_path, rng):
    """quant_calibration + spatial_shards>1 (round-3 ADVICE: calibration used
    to run unsharded): the calibration forward now runs under the serving
    mesh and the served output must bit-match the unsharded calibrated one."""
    from test_predict_cli import make_model_dir
    from lama_tpu.data.io import load_image, save_image
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
    for shards in (0, 2):
        outdir = tmp_path / f'out_cal_s{shards}'
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={outdir}', 'device=cpu', 'precision=int8',
                          'quant_calibration=1', f'spatial_shards={shards}'])
        outs[shards] = load_image(str(outdir / 'a_mask.png'))
    np.testing.assert_array_equal(outs[0], outs[2])


def test_calibrate_int8_requires_int8_mode(rng):
    from lama_tpu.serving import calibrate_int8
    with pytest.raises(ValueError, match='int8'):
        calibrate_int8(None, {}, [])


def test_predict_cli_quant_calibration(tmp_path, rng):
    """precision=int8 quant_calibration=1: static scales calibrated on the
    served image itself -> output identical to the dynamic-scale serve."""
    from test_predict_cli import make_model_dir
    from lama_tpu.data.io import load_image, save_image
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
    for calib in (0, 1):
        outdir = tmp_path / f'out_c{calib}'
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={outdir}', 'device=cpu', 'precision=int8',
                          f'quant_calibration={calib}'])
        outs[calib] = load_image(str(outdir / 'a_mask.png'))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_predict_cli_quant_calibration_requires_int8(tmp_path, rng):
    from test_predict_cli import make_model_dir
    from lama_tpu.data.io import save_image
    import predict as predict_cli
    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'in'
    indir.mkdir()
    save_image(str(indir / 'a.png'), rng.rand(64, 64, 3).astype(np.float32))
    save_image(str(indir / 'a_mask.png'), np.ones((64, 64, 1), np.float32))
    with pytest.raises(ValueError, match='quant_calibration'):
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={tmp_path / "out"}', 'device=cpu',
                          'quant_calibration=1'])


def test_refine_rejects_int8(tmp_path, rng):
    """refine optimizes features by gradient through the rear; int8's round()
    has zero gradient, so the CLI must reject the combination loudly."""
    from test_predict_cli import make_model_dir
    import predict as predict_cli
    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'in'
    indir.mkdir()
    from lama_tpu.data.io import save_image
    save_image(str(indir / 'a.png'), rng.rand(64, 64, 3).astype(np.float32))
    save_image(str(indir / 'a_mask.png'),
               np.ones((64, 64, 1), np.float32))
    with pytest.raises(ValueError, match='int8'):
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={tmp_path / "out"}', 'device=cpu',
                          'refine=true', 'precision=int8'])


def test_int8_serving_path_end_to_end(tmp_path, rng):
    """precision=int8 through load_serving_model + make_inpaint_forward:
    runs under jit, composite preserves known pixels exactly, hole output
    stays close to the fp32 serve; the mode is a per-generator attribute."""
    from test_predict_cli import make_model_dir
    from lama_tpu.serving import load_serving_model, make_inpaint_forward

    model_dir = make_model_dir(tmp_path)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    mask = jnp.zeros((1, 64, 64, 1), jnp.float32).at[:, 16:40, 16:40].set(1.0)

    outs = {}
    for precision in ('fp32', 'int8'):
        gen, variables, _ = load_serving_model(str(model_dir), 'best',
                                               precision=precision)
        assert gen.mode.int8 == (precision == 'int8')
        fn = jax.jit(make_inpaint_forward(gen))
        outs[precision] = np.asarray(fn(variables, img, mask))

    known = np.asarray(mask[0, ..., 0]) == 0
    np.testing.assert_array_equal(outs['int8'][0][known], np.asarray(img)[0][known])
    # random tiny model, sigmoid head: int8 drift stays well under visibility
    hole_diff = np.abs(outs['int8'][0][~known] - outs['fp32'][0][~known])
    assert hole_diff.max() < 0.15, hole_diff.max()
    assert hole_diff.mean() < 0.02, hole_diff.mean()


def test_headline_mode_composes_with_spatial_shards(tmp_path, rng):
    """The full bench headline mode (int8 + static scales + zero-pad +
    bf16 spectral store) under spatial_shards: the H-sharded DFT einsums
    contract over the sharded axis (GSPMD partial sums + psum before the
    bf16 store), so outputs must match the unsharded serve to write-out
    precision."""
    from test_predict_cli import make_model_dir
    from lama_tpu.data.io import load_image, save_image
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
    for shards in (0, 2):
        outdir = tmp_path / f'out_s{shards}'
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={outdir}', 'device=cpu', 'precision=int8',
                          'quant_zero_pad=true', 'quant_calibration=1',
                          'spectral_bf16_store=true',
                          f'spatial_shards={shards}'])
        outs[shards] = load_image(str(outdir / 'a_mask.png'))
    known = mask[..., 0] == 0
    np.testing.assert_array_equal(outs[0][known], outs[2][known])
    # hole: bf16 stores round AFTER the psum of H-sharded DFT partial sums,
    # whose f32 accumulation order differs from the unsharded contraction —
    # allow write-out-precision drift, require no visible difference
    np.testing.assert_allclose(outs[2], outs[0], atol=2 / 255)
