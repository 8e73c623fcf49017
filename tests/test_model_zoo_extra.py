"""Tests for the experimental model-zoo variants and alternative aux nets."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_config_global_generator(rng):
    from lama_tpu.models.pix2pixhd_extra import ConfigGlobalGenerator
    gen = ConfigGlobalGenerator(
        input_nc=4, output_nc=3, ngf=8, n_downsampling=2, n_blocks=1,
        multidilation_kwargs=dict(comb_mode='cat_in', dilation_num=2),
        manual_block_spec=[
            dict(n_blocks=1, use_default=False, resnet_block_kind='resnetblock',
                 resnet_conv_kind='default'),
            dict(n_blocks=1, use_default=False, resnet_block_kind='resnetblock5x5',
                 resnet_conv_kind='default'),
        ])
    x = jnp.asarray(rng.rand(1, 64, 64, 4).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    out = gen.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 3)


def test_config_global_generator_bilinear_deconv(rng):
    from lama_tpu.models.pix2pixhd_extra import ConfigGlobalGenerator
    gen = ConfigGlobalGenerator(input_nc=4, output_nc=3, ngf=8, n_downsampling=2,
                                n_blocks=1, deconv_kind='bilinear',
                                resnet_block_kind='resnetblock',
                                resnet_conv_kind='default')
    x = jnp.asarray(rng.rand(1, 32, 32, 4).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    assert gen.apply(variables, x, train=False).shape == (1, 32, 32, 3)


def test_super_channels_generator(rng):
    from lama_tpu.models.pix2pixhd_extra import (GlobalGeneratorFromSuperChannels,
                                                 convert_super_channels)
    channels = convert_super_channels([8, 8, 8, 8, 8, 8], 3)
    assert len(channels) == 10  # 4 down + 3 bottleneck + 3 up
    gen = GlobalGeneratorFromSuperChannels(input_nc=4, output_nc=3,
                                           n_downsampling=3, n_blocks=3,
                                           super_channels=[8, 8, 8, 8, 8, 8])
    x = jnp.asarray(rng.rand(1, 64, 64, 4).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    assert gen.apply(variables, x, train=False).shape == (1, 64, 64, 3)


def test_nlayer_discriminator_as_gen(rng):
    from lama_tpu.models.pix2pixhd_extra import NLayerDiscriminatorAsGen
    m = NLayerDiscriminatorAsGen(input_nc=3, ndf=8, n_layers=2)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape[-1] == 1


def test_ffcse_block(rng):
    from lama_tpu.models.ffc import FFCSE_block
    m = FFCSE_block(channels=32, ratio_g=0.5)
    x_l = jnp.asarray(rng.rand(1, 8, 8, 16).astype(np.float32))
    x_g = jnp.asarray(rng.rand(1, 8, 8, 16).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), (x_l, x_g))
    out_l, out_g = m.apply(variables, (x_l, x_g))
    assert out_l.shape == x_l.shape and out_g.shape == x_g.shape


def test_mobilenet_encoder_and_c1_decoder(rng):
    from lama_tpu.models.aux.segmentation import SegmentationModule
    sm = SegmentationModule(weights_path=None, arch_encoder='mobilenetv2dilated')
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    labels, scores = sm.predict(imgs)
    assert labels.shape == (1, 64, 64)
    assert scores.shape == (1, 64, 64, 150)


def test_lpips_alex_squeeze(rng):
    import os
    from lama_tpu.evaluation.lpips import LPIPS
    for net, n_heads in [('alex', 5), ('squeeze', 7)]:
        lin = f'/root/reference/models/lpips_models/{net}.pth'
        lp = LPIPS(net=net, lin_weights_path=lin if os.path.exists(lin) else None)
        assert len(lp.lin_weights) == n_heads
        a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        assert float(lp(a, a)[0]) < 1e-6
        assert float(lp(a, jnp.clip(a + 0.1, 0, 1))[0]) > 0
