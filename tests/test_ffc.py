"""FFC stack tests: FourierUnit numerics vs a torch spec, stream plumbing,
generator forward shape/jit, discriminator outputs.

The FourierUnit spec below is the *semantic contract* from the reference
(ffc.py:76-113): rfft2(ortho) -> interleaved re/im channels -> 1x1 conv ->
BN -> ReLU -> un-interleave -> irfft2(ortho). We express it with torch
primitives in the test to cross-check our NHWC/JAX implementation."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from lama_tpu.models.ffc import (FFC_BN_ACT, FFCNLayerDiscriminator,
                                 FFCResNetGenerator, FFCResnetBlock, FourierUnit,
                                 SpectralTransform)


def to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def torch_fourier_unit_spec(x, conv_w, bn_gamma, bn_beta, eps=1e-5):
    """Eval-mode FourierUnit with running stats == init (mean 0, var 1)."""
    fft = torch.fft.rfftn(x, dim=(-2, -1), norm='ortho')
    f = torch.stack((fft.real, fft.imag), dim=-1)           # (B,C,H,W2,2)
    f = f.permute(0, 1, 4, 2, 3).contiguous()
    b = x.shape[0]
    f = f.view((b, -1) + f.shape[3:])                        # (B,2C,H,W2)
    f = TF.conv2d(f, conv_w)
    f = f * bn_gamma[None, :, None, None] / np.sqrt(1 + eps) + bn_beta[None, :, None, None]
    f = TF.relu(f)
    f = f.view((b, -1, 2) + f.shape[2:]).permute(0, 1, 3, 4, 2).contiguous()
    f = torch.complex(f[..., 0], f[..., 1])
    return torch.fft.irfftn(f, s=x.shape[-2:], dim=(-2, -1), norm='ortho')


def test_fourier_unit_matches_spec(rng):
    c = 8
    x = rng.randn(2, c, 12, 16).astype(np.float32)
    fu = FourierUnit(features=c)
    variables = fu.init(jax.random.PRNGKey(0), to_nhwc(x), train=False)

    conv_w = rng.randn(2 * c, 2 * c, 1, 1).astype(np.float32) * 0.1
    gamma = rng.rand(2 * c).astype(np.float32) + 0.5
    beta = rng.randn(2 * c).astype(np.float32) * 0.1

    variables = {
        'params': {
            'conv_layer': {'kernel': jnp.asarray(np.transpose(conv_w, (2, 3, 1, 0)))},
            'bn': {'scale': jnp.asarray(gamma), 'bias': jnp.asarray(beta)},
        },
        'batch_stats': variables['batch_stats'],
    }
    out = fu.apply(variables, to_nhwc(x), train=False)
    ref = torch_fourier_unit_spec(torch.from_numpy(x), torch.from_numpy(conv_w),
                                  torch.from_numpy(gamma), torch.from_numpy(beta))
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_spectral_transform_shapes(rng):
    x = to_nhwc(rng.randn(2, 16, 16, 16).astype(np.float32))
    st = SpectralTransform(features=32, enable_lfu=True)
    variables = st.init(jax.random.PRNGKey(0), x, train=False)
    out = st.apply(variables, x, train=False)
    assert out.shape == (2, 16, 16, 32)

    st2 = SpectralTransform(features=32, stride=2, enable_lfu=False)
    v2 = st2.init(jax.random.PRNGKey(0), x, train=False)
    assert st2.apply(v2, x, train=False).shape == (2, 8, 8, 32)


def test_ffc_bn_act_streams(rng):
    x = to_nhwc(rng.randn(2, 64, 16, 16).astype(np.float32))
    # ratio_gin=0 -> whole input is local stream
    m = FFC_BN_ACT(64, 64, kernel_size=3, padding=1, ratio_gin=0, ratio_gout=0.75,
                   enable_lfu=False, activation='relu')
    variables = m.init(jax.random.PRNGKey(0), (x, None), train=False)
    x_l, x_g = m.apply(variables, (x, None), train=False)
    assert x_l.shape == (2, 16, 16, 16)
    assert x_g.shape == (2, 16, 16, 48)
    assert np.asarray(x_l).min() >= 0  # relu applied


def test_ffc_resnet_block_residual(rng):
    dim = 32
    x_l = to_nhwc(rng.randn(1, dim - dim * 3 // 4, 8, 8).astype(np.float32))
    x_g = to_nhwc(rng.randn(1, dim * 3 // 4, 8, 8).astype(np.float32))
    block = FFCResnetBlock(dim, ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False)
    variables = block.init(jax.random.PRNGKey(0), (x_l, x_g), train=False)
    out_l, out_g = block.apply(variables, (x_l, x_g), train=False)
    assert out_l.shape == x_l.shape and out_g.shape == x_g.shape


BIG_LAMA_KW = dict(
    input_nc=4, output_nc=3, ngf=16, n_downsampling=3, n_blocks=2,
    add_out_act='sigmoid',
    init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False),
)


def test_generator_forward_and_param_names(rng):
    gen = FFCResNetGenerator(**BIG_LAMA_KW)
    x = to_nhwc(rng.rand(1, 4, 64, 64).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    out = jax.jit(lambda v, x: gen.apply(v, x, train=False))(variables, x)
    assert out.shape == (1, 64, 64, 3)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0  # sigmoid out

    params = variables['params']
    # torch sequential index map: 1 init, 2-4 down, 5-6 blocks, 8/11/14... ups
    for name in ['model_1', 'model_2', 'model_3', 'model_4', 'model_5', 'model_6',
                 'model_8', 'model_9', 'model_11', 'model_12', 'model_14', 'model_15',
                 'model_18']:
        assert name in params, (name, sorted(params))
    # bottleneck blocks carry the spectral path
    assert 'convg2g' in params['model_5']['conv1']['ffc']


def test_generator_train_mode_updates_stats(rng):
    gen = FFCResNetGenerator(**BIG_LAMA_KW)
    x = to_nhwc(rng.rand(2, 4, 32, 32).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    out, updates = gen.apply(variables, x, train=True, mutable=['batch_stats'])
    before = variables['batch_stats']['model_1']['bn_l']['mean']
    after = updates['batch_stats']['model_1']['bn_l']['mean']
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_ffc_discriminator(rng):
    disc = FFCNLayerDiscriminator(input_nc=3, ndf=16, n_layers=3,
                                  init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
                                  conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False))
    x = to_nhwc(rng.rand(1, 3, 64, 64).astype(np.float32))
    variables = disc.init(jax.random.PRNGKey(0), x, train=False)
    score, feats = disc.apply(variables, x, train=False)
    assert score.shape[-1] == 1
    assert len(feats) == 4  # n_layers + 1 pre-score activations


def test_generator_remat_blocks_numerics_identical(rng):
    """remat_blocks=True must be a pure recompute schedule: identical param
    tree; train-mode forward/batch_stats/gradients equal to fp32 fusion
    noise (XLA schedules fusions differently under checkpoint, so bit-
    exactness is not guaranteed — but the math is the same ops)."""
    x = to_nhwc(rng.rand(2, 4, 32, 32).astype(np.float32))
    gen_a = FFCResNetGenerator(**BIG_LAMA_KW)
    gen_b = FFCResNetGenerator(remat_blocks=True, **BIG_LAMA_KW)
    v_a = gen_a.init(jax.random.PRNGKey(0), x, train=True)
    v_b = gen_b.init(jax.random.PRNGKey(0), x, train=True)
    flat_a = jax.tree_util.tree_leaves_with_path(v_a['params'])
    flat_b = jax.tree_util.tree_leaves_with_path(v_b['params'])
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, la), (_, lb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def loss(gen, v):
        out, upd = gen.apply({'params': v['params'],
                              'batch_stats': v['batch_stats']}, x,
                             train=True, mutable=['batch_stats'])
        return jnp.sum(out.astype(jnp.float32) ** 2), (out, upd)

    (l_a, (out_a, upd_a)), g_a = jax.value_and_grad(
        lambda p: loss(gen_a, {'params': p,
                               'batch_stats': v_a['batch_stats']}),
        has_aux=True)(v_a['params'])
    (l_b, (out_b, upd_b)), g_b = jax.value_and_grad(
        lambda p: loss(gen_b, {'params': p,
                               'batch_stats': v_b['batch_stats']}),
        has_aux=True)(v_b['params'])
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)
    leaves_a = jax.tree_util.tree_leaves(g_a)
    leaves_b = jax.tree_util.tree_leaves(g_b)
    # normalize by the GLOBAL gradient scale: leaves whose own gradient is
    # cancellation noise (~1e-6 of the global scale) carry no signal and
    # elementwise rtol on them is meaningless under reassociated fp32
    gscale = max(float(np.abs(np.asarray(l)).max()) for l in leaves_a)
    for la, lb in zip(leaves_a, leaves_b):
        da, db = np.asarray(la), np.asarray(lb)
        assert np.abs(da - db).max() <= 5e-5 * gscale, (
            np.abs(da - db).max(), gscale)
    for la, lb in zip(jax.tree_util.tree_leaves(upd_a['batch_stats']),
                      jax.tree_util.tree_leaves(upd_b['batch_stats'])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-7)
