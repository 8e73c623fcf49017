"""THE parity gate: run the actual reference PyTorch modules
(/root/reference, read-only) next to our JAX re-implementation with
CONVERTED WEIGHTS and compare outputs element-wise.

This validates three things at once: the architecture graph, the checkpoint
converter's key-space/layout mapping, and the numerics — exactly what
bit-compatible big-lama loading requires (SURVEY §5.4/§7 step 2), without
needing the (unavailable, zero-egress) pretrained weights.

The reference imports kornia / pytorch_lightning, which only unused code
paths touch; they are stubbed.
"""
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


@pytest.fixture(scope='module')
def reference_modules():
    from conftest import stub_reference_deps
    stub_reference_deps()
    from saicinpainting.training.modules import ffc as ref_ffc
    from saicinpainting.training.modules import pix2pixhd as ref_p2p
    return ref_ffc, ref_p2p


GEN_KW = dict(
    input_nc=4, output_nc=3, ngf=8, n_downsampling=3, n_blocks=2,
    add_out_act='sigmoid',
    init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False),
)


def to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_ffc_generator_matches_reference_with_converted_weights(reference_modules, rng):
    ref_ffc, _ = reference_modules
    torch.manual_seed(0)
    ref_gen = ref_ffc.FFCResNetGenerator(**GEN_KW).eval()
    state_dict = {f'generator.{k}': v for k, v in ref_gen.state_dict().items()}

    from lama_tpu.models.ffc import FFCResNetGenerator
    from lama_tpu.training.convert import torch_to_flax
    gen = FFCResNetGenerator(**GEN_KW)
    x = rng.rand(2, 4, 64, 64).astype(np.float32)
    template = gen.init(jax.random.PRNGKey(0), to_nhwc(x), train=False)
    # num_batches_tracked keys exist only on the torch side; everything else
    # must map (strict converts every template leaf)
    variables = torch_to_flax(state_dict, template, model=gen,
                              prefix='generator.', strict=True)

    with torch.no_grad():
        ref_out = ref_gen(torch.from_numpy(x)).numpy()
    out = from_nhwc(gen.apply(variables, to_nhwc(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-4)


def test_ffc_generator_lfu_matches_reference(reference_modules, rng):
    """LFU branch enabled (2x2 spatial split FourierUnit, ffc.py:148-157)."""
    ref_ffc, _ = reference_modules
    kw = dict(GEN_KW)
    kw['resnet_conv_kwargs'] = dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=True)
    torch.manual_seed(1)
    ref_gen = ref_ffc.FFCResNetGenerator(**kw).eval()
    state_dict = ref_gen.state_dict()

    from lama_tpu.models.ffc import FFCResNetGenerator
    from lama_tpu.training.convert import torch_to_flax
    gen = FFCResNetGenerator(**kw)
    x = rng.rand(1, 4, 64, 64).astype(np.float32)
    template = gen.init(jax.random.PRNGKey(0), to_nhwc(x), train=False)
    variables = torch_to_flax(state_dict, template, model=gen, strict=True)

    with torch.no_grad():
        ref_out = ref_gen(torch.from_numpy(x)).numpy()
    out = from_nhwc(gen.apply(variables, to_nhwc(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-4)


def test_nlayer_discriminator_matches_reference(reference_modules, rng):
    _, ref_p2p = reference_modules
    torch.manual_seed(0)
    ref_disc = ref_p2p.NLayerDiscriminator(input_nc=3, ndf=8, n_layers=4).eval()
    state_dict = ref_disc.state_dict()

    from lama_tpu.models.pix2pixhd import NLayerDiscriminator
    from lama_tpu.training.convert import torch_to_flax
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=4)
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    template = disc.init(jax.random.PRNGKey(0), to_nhwc(x), train=False)
    variables = torch_to_flax(state_dict, template, model=disc, strict=True)

    with torch.no_grad():
        ref_score, ref_feats = ref_disc(torch.from_numpy(x))
    score, feats = disc.apply(variables, to_nhwc(x), train=False)
    np.testing.assert_allclose(from_nhwc(score), ref_score.numpy(),
                               rtol=1e-3, atol=2e-4)
    # reference returns act[:-1] == n_layers+1 stage outputs; ours likewise
    assert len(feats) == len(ref_feats)
    for ours, theirs in zip(feats, ref_feats):
        np.testing.assert_allclose(from_nhwc(ours), theirs.numpy(),
                                   rtol=1e-3, atol=2e-4)


def test_global_generator_matches_reference(reference_modules, rng):
    _, ref_p2p = reference_modules
    torch.manual_seed(0)
    ref_gen = ref_p2p.GlobalGenerator(input_nc=4, output_nc=3, ngf=8,
                                      n_downsampling=2, n_blocks=2,
                                      add_out_act='sigmoid').eval()
    state_dict = ref_gen.state_dict()

    from lama_tpu.models.pix2pixhd import GlobalGenerator
    from lama_tpu.training.convert import torch_to_flax
    gen = GlobalGenerator(input_nc=4, output_nc=3, ngf=8, n_downsampling=2,
                          n_blocks=2, add_out_act='sigmoid')
    x = rng.rand(1, 4, 48, 48).astype(np.float32)
    template = gen.init(jax.random.PRNGKey(0), to_nhwc(x), train=False)
    variables = torch_to_flax(state_dict, template, model=gen, strict=True)

    with torch.no_grad():
        ref_out = ref_gen(torch.from_numpy(x)).numpy()
    out = from_nhwc(gen.apply(variables, to_nhwc(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-4)


def test_grouped_spectral_transform_matches_reference(reference_modules, rng):
    """groups>1 threads through FourierUnit\'s 1x1 spectral conv (reference
    ffc.py creates conv_layer/fu/lfu with groups) — parameter shapes and
    outputs must match the torch module with converted weights."""
    ref_ffc, _ = reference_modules
    torch.manual_seed(0)
    ref_st = ref_ffc.SpectralTransform(8, 8, stride=1, groups=2,
                                       enable_lfu=False).eval()
    state_dict = ref_st.state_dict()

    from lama_tpu.models.ffc import SpectralTransform
    from lama_tpu.training.convert import torch_to_flax
    st = SpectralTransform(features=8, stride=1, groups=2, enable_lfu=False)
    x = rng.rand(1, 8, 16, 16).astype(np.float32)
    template = st.init(jax.random.PRNGKey(0), to_nhwc(x), train=False)
    variables = torch_to_flax(state_dict, template, model=st, strict=True)

    with torch.no_grad():
        ref_out = ref_st(torch.from_numpy(x)).numpy()
    out = from_nhwc(st.apply(variables, to_nhwc(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-4)
