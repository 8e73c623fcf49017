"""Extended reference-parity suite: SSIM, ADE20k dilated encoder (ResNetPL
backbone), multidilated generator, FFC discriminator, multiscale family —
all run against the actual reference torch code with converted weights."""
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference checkout not available')


@pytest.fixture(scope='module', autouse=True)
def stub_reference_deps_fixture():
    from conftest import stub_reference_deps
    stub_reference_deps()
    yield


def to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_ssim_matches_reference(rng):
    from saicinpainting.evaluation.losses.ssim import SSIM as RefSSIM
    from lama_tpu.evaluation.ssim import ssim

    a = rng.rand(2, 3, 40, 40).astype(np.float32)
    b = np.clip(a + rng.randn(2, 3, 40, 40).astype(np.float32) * 0.05, 0, 1)
    ref = RefSSIM(window_size=11, size_average=False).eval()
    with torch.no_grad():
        ref_vals = ref(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    vals = np.asarray(ssim(to_nhwc(a), to_nhwc(b)))
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-4, atol=1e-5)


def test_ade20k_dilated_encoder_matches_reference(rng):
    """The ResNetPL backbone: reference ResnetDilated(resnet50, 8) feature
    maps vs our ResNetDilatedEncoder with converted weights."""
    from models.ade20k.base import ResnetDilated
    from models.ade20k.resnet import resnet50
    from lama_tpu.models.aux.resnet import ResNetDilatedEncoder
    from lama_tpu.training.convert import torch_to_flax

    torch.manual_seed(0)
    ref = ResnetDilated(resnet50(pretrained=False), dilate_scale=8).eval()
    state_dict = ref.state_dict()

    model = ResNetDilatedEncoder()
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    template = model.init(jax.random.PRNGKey(0), to_nhwc(x), train=False)
    variables = torch_to_flax(state_dict, template, model=model, strict=True)

    with torch.no_grad():
        ref_feats = ref(torch.from_numpy(x), return_feature_maps=True)
    feats = model.apply(variables, to_nhwc(x), train=False)
    assert len(feats) == len(ref_feats)
    for ours, theirs in zip(feats, ref_feats):
        np.testing.assert_allclose(from_nhwc(ours), theirs.numpy(),
                                   rtol=1e-3, atol=3e-4)


def test_multidilated_generator_matches_reference(rng):
    from saicinpainting.training.modules.pix2pixhd import \
        MultiDilatedGlobalGenerator as RefGen
    from lama_tpu.models.pix2pixhd import MultiDilatedGlobalGenerator
    from lama_tpu.training.convert import torch_to_flax

    kw = dict(input_nc=4, output_nc=3, ngf=8, n_downsampling=2, n_blocks=2,
              add_out_act='sigmoid',
              multidilation_kwargs=dict(comb_mode='cat_in', dilation_num=2))
    torch.manual_seed(0)
    ref = RefGen(**kw).eval()
    gen = MultiDilatedGlobalGenerator(**kw)
    x = rng.rand(1, 4, 48, 48).astype(np.float32)
    template = gen.init(jax.random.PRNGKey(0), to_nhwc(x), train=False)
    variables = torch_to_flax(ref.state_dict(), template, model=gen, strict=True)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = from_nhwc(gen.apply(variables, to_nhwc(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-4)


def test_ffc_discriminator_matches_reference(rng):
    from saicinpainting.training.modules.ffc import \
        FFCNLayerDiscriminator as RefDisc
    from lama_tpu.models.ffc import FFCNLayerDiscriminator
    from lama_tpu.training.convert import torch_to_flax

    # ratios must chain (stage N's ratio_gout == stage N+1's ratio_gin) —
    # the torch reference crashes on inconsistent combinations too
    kw = dict(input_nc=3, ndf=8, n_layers=3,
              init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0.5, enable_lfu=False),
              conv_kwargs=dict(ratio_gin=0.5, ratio_gout=0.5, enable_lfu=False))
    torch.manual_seed(0)
    ref = RefDisc(**kw).eval()
    disc = FFCNLayerDiscriminator(**kw)
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    template = disc.init(jax.random.PRNGKey(0), to_nhwc(x), train=False)
    variables = torch_to_flax(ref.state_dict(), template, model=disc, strict=True)
    with torch.no_grad():
        ref_score, ref_feats = ref(torch.from_numpy(x))
    score, feats = disc.apply(variables, to_nhwc(x), train=False)
    np.testing.assert_allclose(from_nhwc(score), ref_score.numpy(),
                               rtol=1e-3, atol=3e-4)
    assert len(feats) == len(ref_feats)


def test_fourier_unit_ffc3d_matches_reference(rng):
    """ffc3d=True: 3-D FFT over (C, H, W) — reference ffc.py:85,106-107."""
    from saicinpainting.training.modules.ffc import FourierUnit as RefFU
    from lama_tpu.models.ffc import FourierUnit
    from lama_tpu.training.convert import torch_to_flax

    c = 8
    torch.manual_seed(0)
    ref = RefFU(c, c, ffc3d=True).eval()
    fu = FourierUnit(features=c, ffc3d=True)
    x = rng.rand(2, c, 16, 16).astype(np.float32)
    template = fu.init(jax.random.PRNGKey(0), to_nhwc(x), train=False)
    variables = torch_to_flax(ref.state_dict(), template, model=fu, strict=True)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = from_nhwc(fu.apply(variables, to_nhwc(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-4)
