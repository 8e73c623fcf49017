"""Tests for the config-gated training features wired into the fused GAN step
(reference trainers/default.py:48-84,157-173): distance-weighted loss masks,
fake-fakes discriminator regularisation, multiscale input noise, the
image_to_discriminator switch, and the host-side rescale-ramp/constant-area
crop curricula."""
import numpy as np

import jax
import jax.numpy as jnp

from lama_tpu.losses.adversarial import make_discrim_loss
from lama_tpu.losses.distance_weighting import make_mask_distance_weighter
from lama_tpu.models.fake_fakes import FakeFakesGenerator
from lama_tpu.models.ffc import FFCResNetGenerator
from lama_tpu.models.pix2pixhd import NLayerDiscriminator
from lama_tpu.training.state import create_train_state, make_optimizer
from lama_tpu.training.step import (EMAConfig, InpaintingTrainStep, LossConfig,
                                    make_multiscale_noise)

TINY_GEN = dict(
    input_nc=4, output_nc=3, ngf=8, n_downsampling=2, n_blocks=2,
    add_out_act='sigmoid',
    init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
    resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False),
)


def make_batch(rng, b=2, size=32):
    img = rng.rand(b, size, size, 3).astype(np.float32)
    mask = np.zeros((b, size, size, 1), np.float32)
    mask[:, size // 4: size // 2, size // 4: size // 2] = 1.0
    return {'image': jnp.asarray(img), 'mask': jnp.asarray(mask)}


def build_step(input_nc=4, **step_kwargs):
    gen = FFCResNetGenerator(**{**TINY_GEN, 'input_nc': input_nc})
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    adv = make_discrim_loss('r1', weight=10, gp_coef=0.001,
                            mask_as_fake_target=True, allow_scale_mask=True)
    g_tx = make_optimizer('adam', lr=1e-3, clip_grad_norm=1.0)
    d_tx = make_optimizer('adam', lr=1e-4, clip_grad_norm=1.0)
    step = InpaintingTrainStep(gen, disc, adv, g_tx, d_tx,
                               loss_config=LossConfig(resnet_pl_weight=0.0),
                               ema=EMAConfig(enabled=False), **step_kwargs)
    return gen, disc, g_tx, d_tx, step


def _run_steps(step, gen, disc, g_tx, d_tx, batch, n=2, seed=0):
    gen_input_fn = None
    if step.add_noise_kwargs:
        gen_input_fn = lambda img, mask: step._gen_input(
            img, mask, rng=jax.random.PRNGKey(0))
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, batch, g_tx, d_tx,
                               gen_input_fn=gen_input_fn)
    jit_step = jax.jit(step)
    hist = []
    for i in range(n):
        state, metrics = jit_step(state, batch, jax.random.PRNGKey(seed + i))
        hist.append({k: float(v) for k, v in metrics.items()})
    return state, hist


def test_distance_weighted_mask_changes_l1(rng):
    """The blur weighter produces a supervision mask < mask near the boundary,
    so the weighted L1 differs from the unweighted one (default.py:82-84)."""
    batch = make_batch(rng)
    gen, disc, g_tx, d_tx, plain = build_step()
    _, plain_hist = _run_steps(plain, gen, disc, g_tx, d_tx, batch, n=1)

    weighter = make_mask_distance_weighter(kind='blur', kernel_size=5)
    gen2, disc2, g_tx2, d_tx2, weighted = build_step(
        distance_weighter=weighter, distance_weighted_mask_for_discr=True)
    _, w_hist = _run_steps(weighted, gen2, disc2, g_tx2, d_tx2, batch, n=1)

    for m in plain_hist + w_hist:
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
    # identical init params (same seeds), different supervision mask -> L1 differs
    assert plain_hist[0]['gen_l1'] != w_hist[0]['gen_l1']


def test_fake_fakes_term_present_and_gated(rng):
    batch = make_batch(rng)
    ff_gen = FakeFakesGenerator(aug_proba=0.5)
    gen, disc, g_tx, d_tx, step = build_step(fake_fakes_proba=1.0,
                                             fake_fakes_gen=ff_gen)
    _, hist = _run_steps(step, gen, disc, g_tx, d_tx, batch, n=2)
    for m in hist:
        assert 'discr_adv_fake_fakes' in m
        assert np.isfinite(m['discr_adv_fake_fakes'])
        # proba=1.0 -> the Bernoulli draw always fires; term is a real softplus
        # loss so strictly positive
        assert m['discr_adv_fake_fakes'] > 0

    # proba ~ 0+eps: term present in metrics but (almost surely) zeroed out
    gen2, disc2, g_tx2, d_tx2, step2 = build_step(fake_fakes_proba=1e-2,
                                                  fake_fakes_gen=ff_gen)
    _, hist2 = _run_steps(step2, gen2, disc2, g_tx2, d_tx2, batch, n=1, seed=7)
    assert hist2[0]['discr_adv_fake_fakes'] == 0.0


def test_multiscale_noise_shapes_and_input_channels(rng):
    base = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    noise = make_multiscale_noise(jax.random.PRNGKey(0), base, scales=4)
    assert noise.shape == (2, 32, 32, 4)
    assert np.isfinite(np.asarray(noise)).all()

    # add_noise_kwargs widens the generator input: 3 + scales + 1 (mask)
    batch = make_batch(rng)
    gen, disc, g_tx, d_tx, step = build_step(
        input_nc=3 + 4 + 1, add_noise_kwargs=dict(scales=4), noise_fill_hole=True)
    x = step._gen_input(batch['image'], batch['mask'], rng=jax.random.PRNGKey(0))
    assert x.shape[-1] == 3 + 4 + 1
    _, hist = _run_steps(step, gen, disc, g_tx, d_tx, batch, n=1)
    assert np.isfinite(hist[0]['gen_total'])


def test_image_to_discriminator_inpainted(rng):
    """image_to_discriminator='inpainted' supervises the composite, whose known
    region equals the target -> strictly smaller L1 (weight on known only)."""
    batch = make_batch(rng)
    gen, disc, g_tx, d_tx, plain = build_step()
    _, plain_hist = _run_steps(plain, gen, disc, g_tx, d_tx, batch, n=1)
    gen2, disc2, g_tx2, d_tx2, inp = build_step(image_to_discriminator='inpainted')
    _, inp_hist = _run_steps(inp, gen2, disc2, g_tx2, d_tx2, batch, n=1)
    # L1 weights known=10/missing=0; the composite is exact on known pixels
    assert inp_hist[0]['gen_l1'] < plain_hist[0]['gen_l1']
    assert inp_hist[0]['gen_l1'] < 1e-5


def test_trainer_rescale_and_crop_host_prep(rng, tmp_path):
    """_prepare_train_batch applies the rescale ramp and constant-area crop on
    host (reference default.py:48-54 semantics)."""
    from lama_tpu.config.node import ConfigNode
    from lama_tpu.training.trainer import InpaintingTrainer

    cfg = ConfigNode({
        'generator': dict(kind='ffc_resnet', **TINY_GEN),
        'discriminator': dict(kind='pix2pixhd_nlayer', input_nc=3, ndf=8, n_layers=2),
        'losses': {'adversarial': dict(kind='r1', weight=10, gp_coef=0.001),
                   'l1': dict(weight_known=10, weight_missing=0),
                   'feature_matching': dict(weight=100)},
        'optimizers': {'generator': dict(kind='adam', lr=1e-3),
                       'discriminator': dict(kind='adam', lr=1e-4)},
        'training_model': {
            'kind': 'default',
            'rescale_scheduler_kwargs': dict(kind='ladder', start_iters=[2],
                                             values=[48, 64]),
            'const_area_crop_kwargs': dict(min_size=16, max_size=32,
                                           area=24 * 24, round_to_mod=8),
        },
        'data': {'batch_size': 2},
        'trainer': {'kwargs': dict(precision=32)},
        'evaluator': {},
        'visualizer': {'kind': 'noop'},
    })
    trainer = InpaintingTrainer(cfg, str(tmp_path / 'run'))
    batch = {'image': rng.rand(2, 64, 64, 3).astype(np.float32),
             'mask': (rng.rand(2, 64, 64, 1) > 0.7).astype(np.float32)}

    trainer.global_step = 0  # ladder value 48
    out = trainer._prepare_train_batch(batch)
    h, w = out['image'].shape[1:3]
    assert out['image'].shape[0] == 2 and out['mask'].shape[1:3] == (h, w)
    assert 16 <= h <= 32 and 16 <= w <= 32 and h % 8 == 0 and w % 8 == 0
    assert set(np.unique(out['mask'])) <= {0.0, 1.0}

    trainer.global_step = 5  # ladder value 64: crop bounds still hold
    out2 = trainer._prepare_train_batch(batch)
    assert 16 <= out2['image'].shape[1] <= 32


def test_trainer_wires_features_into_step(tmp_path):
    """The trainer must pass distance weighting / fake fakes / noise /
    image_to_discriminator through to InpaintingTrainStep (round-1 defect:
    constructed but dead, VERDICT items 2-4)."""
    from lama_tpu.config.node import ConfigNode
    from lama_tpu.training.trainer import InpaintingTrainer

    cfg = ConfigNode({
        'generator': dict(kind='ffc_resnet', **TINY_GEN),
        'discriminator': dict(kind='pix2pixhd_nlayer', input_nc=3, ndf=8, n_layers=2),
        'losses': {'adversarial': dict(kind='r1', weight=10, gp_coef=0.001),
                   'l1': dict(weight_known=10, weight_missing=0),
                   'feature_matching': dict(weight=100)},
        'optimizers': {'generator': dict(kind='adam', lr=1e-3),
                       'discriminator': dict(kind='adam', lr=1e-4)},
        'training_model': {
            'kind': 'default',
            'distance_weighter_kwargs': dict(kind='blur', kernel_size=3),
            'distance_weighted_mask_for_discr': True,
            'fake_fakes_proba': 0.5,
            'image_to_discriminator': 'inpainted',
        },
        'data': {'batch_size': 2},
        'trainer': {'kwargs': dict(precision=32)},
        'evaluator': {},
        'visualizer': {'kind': 'noop'},
    })
    trainer = InpaintingTrainer(cfg, str(tmp_path / 'run'))
    step = trainer.step_fn
    assert step.distance_weighter is not None
    assert step.distance_weighted_mask_for_discr is True
    assert step.fake_fakes_proba == 0.5 and step.fake_fakes_gen is not None
    assert step.image_to_discriminator == 'inpainted'
