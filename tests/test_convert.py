"""Checkpoint converter tests: flax→torch key-space must match the reference
checkpoint layout (generator.model.N.* — verified against known big-lama key
patterns), and torch→flax→torch must round-trip exactly."""
import numpy as np

import jax
import jax.numpy as jnp

from lama_tpu.models.ffc import FFCResNetGenerator
from lama_tpu.models.pix2pixhd import NLayerDiscriminator
from lama_tpu.training.convert import (flax_to_torch, torch_to_flax,
                                       transposed_conv_paths)

GEN_KW = dict(
    input_nc=4, output_nc=3, ngf=8, n_downsampling=3, n_blocks=2,
    add_out_act='sigmoid',
    init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False),
)


def init_gen():
    gen = FFCResNetGenerator(**GEN_KW)
    x = jnp.zeros((1, 64, 64, 4))
    return gen, gen.init(jax.random.PRNGKey(0), x, train=False)


def test_generator_torch_keyspace():
    gen, variables = init_gen()
    sd = flax_to_torch(variables, model=gen, prefix='generator.')
    # Known key shapes from the reference big-lama layout (ffc.py:305-367,
    # make_checkpoint.py state_dict dump) — scaled to this tiny config:
    # 2 blocks -> concat at 7, ups at 8/11/14, final conv at 18.
    expected = [
        'generator.model.1.ffc.convl2l.weight',
        'generator.model.1.bn_l.weight',
        'generator.model.1.bn_l.running_mean',
        'generator.model.4.ffc.convl2g.weight',
        'generator.model.5.conv1.ffc.convg2g.conv1.0.weight',
        'generator.model.5.conv1.ffc.convg2g.conv1.1.running_var',
        'generator.model.5.conv1.ffc.convg2g.fu.conv_layer.weight',
        'generator.model.5.conv1.ffc.convg2g.fu.bn.weight',
        'generator.model.5.conv1.ffc.convg2g.conv2.weight',
        'generator.model.5.conv1.bn_g.bias',
        'generator.model.6.conv2.ffc.convg2l.weight',
        'generator.model.8.weight',
        'generator.model.8.bias',
        'generator.model.9.weight',
        'generator.model.9.running_mean',
        'generator.model.11.weight',
        'generator.model.14.weight',
        'generator.model.18.weight',
        'generator.model.18.bias',
    ]
    for k in expected:
        assert k in sd, (k, sorted(sd)[:40])

    # conv weight is OIHW
    assert sd['generator.model.1.ffc.convl2l.weight'].shape == (8, 4, 7, 7)
    # transposed conv weight is (I, O, kh, kw): model.8 maps 64 -> 32 ch
    assert sd['generator.model.8.weight'].shape == (64, 32, 3, 3)


def test_generator_roundtrip():
    gen, variables = init_gen()
    sd = flax_to_torch(variables, model=gen, prefix='generator.')
    restored = torch_to_flax(sd, variables, model=gen, prefix='generator.')
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(variables)[0],
            jax.tree_util.tree_flatten_with_path(restored)[0]):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p1))


def test_restored_params_produce_identical_outputs(rng):
    gen, variables = init_gen()
    sd = flax_to_torch(variables, model=gen, prefix='generator.')
    restored = torch_to_flax(sd, variables, model=gen, prefix='generator.')
    x = jnp.asarray(rng.rand(1, 64, 64, 4).astype(np.float32))
    out1 = gen.apply(variables, x, train=False)
    out2 = gen.apply(restored, x, train=False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_discriminator_roundtrip():
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=4)
    x = jnp.zeros((1, 64, 64, 3))
    variables = disc.init(jax.random.PRNGKey(0), x, train=False)
    sd = flax_to_torch(variables, model=disc, prefix='discriminator.')
    assert 'discriminator.model0.0.weight' in sd
    assert 'discriminator.model1.1.running_mean' in sd
    assert 'discriminator.model5.0.weight' in sd  # score head at n_layers+1
    restored = torch_to_flax(sd, variables, model=disc, prefix='discriminator.')
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transposed_conv_paths():
    gen, _ = init_gen()
    # n_down=3, n_blocks=2: ups at 8, 11, 14
    assert transposed_conv_paths(gen) == {'model_8', 'model_11', 'model_14'}


def test_torch_tensor_inputs():
    import torch
    gen, variables = init_gen()
    sd = flax_to_torch(variables, model=gen, prefix='')
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    restored = torch_to_flax(sd_t, variables, model=gen, prefix='')
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
