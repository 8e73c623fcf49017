"""Space-to-depth conv transform: exact parity vs torch reflect conv across
kernel/stride/factor combinations (ops/s2d_conv.py; measured-negative
in-graph on v5e but exact and kept for standalone serving shapes)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from lama_tpu.ops.s2d_conv import conv2d_reflect_s2d, s2d_factor_for


@pytest.mark.parametrize('k,s,a,h,w,c,co', [
    (7, 1, 2, 32, 40, 4, 6),
    (7, 1, 4, 32, 32, 4, 64),
    (7, 1, 8, 64, 64, 4, 64),
    (7, 1, 8, 64, 64, 64, 3),
    (3, 2, 2, 32, 32, 8, 16),
    (3, 2, 4, 64, 64, 8, 16),
    (3, 1, 2, 32, 32, 8, 16),
])
def test_s2d_conv_matches_torch_reflect(rng, k, s, a, h, w, c, co):
    p = k // 2
    x = rng.randn(2, h, w, c).astype(np.float32)
    kern = rng.randn(k, k, c, co).astype(np.float32) * 0.1
    bias = rng.randn(co).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    kt = torch.from_numpy(np.transpose(kern, (3, 2, 0, 1)))
    ref = TF.conv2d(TF.pad(xt, [p] * 4, mode='reflect'), kt,
                    bias=torch.from_numpy(bias), stride=s).numpy()
    out = conv2d_reflect_s2d(jnp.asarray(x), jnp.asarray(kern),
                             bias=jnp.asarray(bias), stride=s, a=a)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('k,a,h,w,c,co', [
    (7, 8, 64, 64, 64, 3),    # the big-lama out head shape family
    (7, 8, 64, 72, 16, 3),    # non-square
    (7, 4, 32, 32, 8, 6),
    (3, 8, 64, 64, 12, 2),
    (5, 2, 16, 16, 4, 4),
])
def test_phase_conv_matches_torch_reflect(rng, k, a, h, w, c, co):
    """Round-5 out-head dispatch: the stride-a phase conv (no s2d input
    transpose) must equal reflect-pad + stride-1 conv exactly."""
    from lama_tpu.ops.s2d_conv import conv2d_reflect_phase
    p = k // 2
    x = rng.randn(2, h, w, c).astype(np.float32)
    kern = rng.randn(k, k, c, co).astype(np.float32) * 0.1
    bias = rng.randn(co).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    kt = torch.from_numpy(np.transpose(kern, (3, 2, 0, 1)))
    ref = TF.conv2d(TF.pad(xt, [p] * 4, mode='reflect'), kt,
                    bias=torch.from_numpy(bias), stride=1).numpy()
    out = conv2d_reflect_phase(jnp.asarray(x), jnp.asarray(kern),
                               bias=jnp.asarray(bias), a=a)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('k,a,h,w,c,co', [
    (7, 8, 64, 64, 64, 3),    # the big-lama out head shape family
    (7, 8, 64, 72, 16, 3),    # non-square
    (7, 4, 32, 32, 8, 6),
    (3, 8, 64, 64, 12, 2),
    (5, 2, 20, 20, 4, 4),
])
def test_phase_zsplit_matches_torch_reflect(rng, k, a, h, w, c, co):
    """Round-5 pad-free out head: zero-padded phase conv core + recomputed
    reflect border strips must equal reflect-pad + stride-1 conv exactly —
    borders included."""
    from lama_tpu.ops.s2d_conv import conv2d_reflect_phase_zsplit
    p = k // 2
    x = rng.randn(2, h, w, c).astype(np.float32)
    kern = rng.randn(k, k, c, co).astype(np.float32) * 0.1
    bias = rng.randn(co).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    kt = torch.from_numpy(np.transpose(kern, (3, 2, 0, 1)))
    ref = TF.conv2d(TF.pad(xt, [p] * 4, mode='reflect'), kt,
                    bias=torch.from_numpy(bias), stride=1).numpy()
    out = conv2d_reflect_phase_zsplit(jnp.asarray(x), jnp.asarray(kern),
                                      bias=jnp.asarray(bias), a=a)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-4)


def test_phase_zsplit_small_input_falls_back(rng):
    """Inputs too small for the strip decomposition (< 4p) route through the
    padded phase conv — same values either way."""
    from lama_tpu.ops.s2d_conv import (conv2d_reflect_phase,
                                       conv2d_reflect_phase_zsplit)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    kern = rng.randn(7, 7, 4, 2).astype(np.float32) * 0.1
    a = conv2d_reflect_phase(jnp.asarray(x), jnp.asarray(kern), a=4)
    b = conv2d_reflect_phase_zsplit(jnp.asarray(x), jnp.asarray(kern), a=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_phase_conv_matches_s2d_conv(rng):
    """The two out-head implementations agree (same algebra, different
    data movement)."""
    from lama_tpu.ops.s2d_conv import conv2d_reflect_phase
    x = rng.randn(1, 64, 64, 32).astype(np.float32)
    kern = rng.randn(7, 7, 32, 3).astype(np.float32) * 0.1
    a = conv2d_reflect_s2d(jnp.asarray(x), jnp.asarray(kern), stride=1, a=8)
    b = conv2d_reflect_phase(jnp.asarray(x), jnp.asarray(kern), a=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_s2d_factor_table():
    assert s2d_factor_for(512, 512, 4, 64, 7, 1) == 2     # stem-like
    assert s2d_factor_for(512, 512, 64, 3, 7, 1) == 8     # head-like
    assert s2d_factor_for(512, 512, 64, 128, 3, 2) == 2   # down1-like
    assert s2d_factor_for(64, 64, 128, 128, 3, 1) is None  # bottleneck: plain
    assert s2d_factor_for(512, 512, 256, 512, 3, 2) is None


def test_s2d_out_head_only_table():
    """out_head_only (the round-4 s2d_out_head serving option,
    ServingMode.s2d='out_head') restricts the dispatch to thin-OUTPUT heads:
    stem/downsample shapes fall back to the plain conv."""
    assert s2d_factor_for(512, 512, 64, 3, 7, 1, out_head_only=True) == 8
    assert s2d_factor_for(512, 512, 4, 64, 7, 1, out_head_only=True) is None
    assert s2d_factor_for(512, 512, 64, 128, 3, 2, out_head_only=True) is None


def test_s2d_out_head_serving_end_to_end(tmp_path, rng):
    """s2d_out_head=true through the predict CLI composed with the full
    headline mode: outputs must match the non-s2d serve (exact algebra; the
    only drift is bf16 float association inside the repacked conv), and the
    mode is per-generator (a later plain load does not disturb it)."""
    import sys as _sys
    import os as _os
    REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    _sys.path.insert(0, _os.path.join(REPO, 'bin'))
    from test_predict_cli import make_model_dir
    from lama_tpu.data.io import load_image, save_image
    import predict as predict_cli

    model_dir = make_model_dir(tmp_path)
    indir = tmp_path / 'in'
    indir.mkdir()
    img = rng.rand(256, 256, 3).astype(np.float32)  # >=256: s2d fires
    mask = np.zeros((256, 256, 1), np.float32)
    mask[64:160, 64:160] = 1.0
    save_image(str(indir / 'a.png'), img)
    save_image(str(indir / 'a_mask.png'), mask)

    mode = ['precision=int8', 'quant_zero_pad=true', 'quant_calibration=1',
            'spectral_bf16_store=true']
    outs = {}
    for tag, extra in (('plain', []), ('s2d', ['s2d_out_head=true'])):
        outdir = tmp_path / f'out_{tag}'
        predict_cli.main([f'model.path={model_dir}', f'indir={indir}',
                          f'outdir={outdir}', 'device=cpu',
                          'dataset.img_suffix=.png'] + mode + extra)
        outs[tag] = load_image(str(outdir / 'a_mask.png'))
    from lama_tpu.serving import load_serving_model
    gen_s2d, _, _ = load_serving_model(str(model_dir), 'best',
                                       precision='int8', s2d_out_head=True)
    assert gen_s2d.mode.s2d == 'out_head' and gen_s2d.mode.int8
    gen_plain, _, _ = load_serving_model(str(model_dir), 'best',
                                         precision='bf16')
    assert gen_plain.mode.s2d == 'off' and not gen_plain.mode.int8
    # per-generator modes coexist; no ambient flags to clear
    assert gen_s2d.mode.s2d == 'out_head' and gen_s2d.mode.int8

    known = mask[..., 0] == 0
    np.testing.assert_allclose(outs['s2d'][known], img[known], atol=2 / 255)
    np.testing.assert_allclose(outs['s2d'], outs['plain'], atol=2 / 255)


@pytest.mark.parametrize('k,h,w,c,co', [
    (7, 32, 32, 4, 64),   # the big-lama stem shape family
    (7, 32, 40, 3, 8),    # non-square, odd channels
    (5, 16, 16, 2, 6),
    (3, 16, 24, 4, 4),
])
def test_xfold_conv_matches_torch_reflect(rng, k, h, w, c, co):
    """Round-5 stem candidate: kx taps folded into input channels (partial
    im2col) must equal reflect-pad + stride-1 conv exactly."""
    from lama_tpu.ops.s2d_conv import conv2d_reflect_xfold
    p = k // 2
    x = rng.randn(2, h, w, c).astype(np.float32)
    kern = rng.randn(k, k, c, co).astype(np.float32) * 0.1
    bias = rng.randn(co).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    kt = torch.from_numpy(np.transpose(kern, (3, 2, 0, 1)))
    ref = TF.conv2d(TF.pad(xt, [p] * 4, mode='reflect'), kt,
                    bias=torch.from_numpy(bias), stride=1).numpy()
    out = conv2d_reflect_xfold(jnp.asarray(x), jnp.asarray(kern),
                               bias=jnp.asarray(bias))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-4)


def test_xfold_stem_mode_plumbing(tmp_path):
    """ServingMode.xfold_stem threads from load_serving_model to the conv
    dispatch (gated off on CPU — forward must be identical to the default
    mode) and composes with the headline options."""
    import sys as _sys
    import os as _os
    REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    _sys.path.insert(0, _os.path.join(REPO, 'bin'))
    from test_predict_cli import make_model_dir
    from lama_tpu.serving import load_serving_model, make_inpaint_forward

    model_dir = make_model_dir(tmp_path)
    gen_x, v_x, _ = load_serving_model(str(model_dir), 'best',
                                       precision='bf16', xfold_stem=True)
    assert gen_x.mode.xfold_stem
    gen_p, v_p, _ = load_serving_model(str(model_dir), 'best',
                                       precision='bf16')
    assert not gen_p.mode.xfold_stem
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(1, 64, 64, 1) > 0.7).astype(np.float32))
    out_x = np.asarray(make_inpaint_forward(gen_x)(v_x, img, mask))
    out_p = np.asarray(make_inpaint_forward(gen_p)(v_p, img, mask))
    np.testing.assert_array_equal(out_x, out_p)
