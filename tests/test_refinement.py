"""Refinement tests: front/rear split equals the full forward, and the
multiscale refinement loop runs end-to-end and preserves known regions."""
import numpy as np

import jax
import jax.numpy as jnp

from lama_tpu.evaluation.refinement import (_pyrdown, _pyrdown_mask,
                                            pad_tensor_to_modulo, refine_predict)
from lama_tpu.models.ffc import FFCResNetGenerator

TINY = dict(
    input_nc=4, output_nc=3, ngf=8, n_downsampling=2, n_blocks=2,
    add_out_act='sigmoid',
    init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False),
)


def test_front_rear_split_equals_full(rng):
    gen = FFCResNetGenerator(**TINY)
    x = jnp.asarray(rng.rand(1, 64, 64, 4).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    full = gen.apply(variables, x, train=False)
    z = gen.apply(variables, x, train=False, stage='front')
    assert isinstance(z, tuple) and z[0] is not None and z[1] is not None
    split = gen.apply(variables, z, train=False, stage='rear')
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), atol=1e-6)


def test_pyrdown_shapes(rng):
    im = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    assert _pyrdown(im).shape == (1, 32, 32, 3)
    m = jnp.asarray((rng.rand(1, 64, 64, 1) > 0.7).astype(np.float32))
    md = _pyrdown_mask(m)
    assert md.shape == (1, 32, 32, 1)
    assert set(np.unique(np.asarray(md))) <= {0.0, 1.0}


def test_pad_tensor_to_modulo(rng):
    im = jnp.asarray(rng.rand(1, 50, 70, 3).astype(np.float32))
    out = pad_tensor_to_modulo(im, 8)
    assert out.shape == (1, 56, 72, 3)


def test_refine_predict_end_to_end(rng):
    gen = FFCResNetGenerator(**TINY)
    h, w = 120, 140
    image = rng.rand(1, h, w, 3).astype(np.float32)
    mask = np.zeros((1, h, w, 1), np.float32)
    mask[:, 40:80, 50:100] = 1.0
    x = jnp.concatenate([jnp.asarray(image) * (1 - mask), jnp.asarray(mask)], axis=-1)
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)

    out = refine_predict(image, mask, gen, variables, modulo=8, n_iters=3,
                         lr=0.002, min_side=60, max_scales=2, px_budget=100000)
    out = np.asarray(out)
    assert out.shape == (1, h, w, 3)
    known = mask[0, :, :, 0] < 0.5
    np.testing.assert_allclose(out[0][known], image[0][known], atol=1e-5)
    assert np.isfinite(out).all()


def test_refine_predict_px_budget_rescale(rng):
    gen = FFCResNetGenerator(**TINY)
    image = rng.rand(1, 128, 128, 3).astype(np.float32)
    mask = np.zeros((1, 128, 128, 1), np.float32)
    mask[:, 30:60, 30:60] = 1.0
    x = jnp.concatenate([jnp.asarray(image) * (1 - mask), jnp.asarray(mask)], axis=-1)
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    out = refine_predict(image, mask, gen, variables, modulo=8, n_iters=2,
                         lr=0.002, min_side=32, max_scales=2, px_budget=64 * 64)
    # px budget forces ~64x64 output
    assert np.prod(out.shape[1:3]) <= 64 * 64 * 1.1
