"""VERDICT r1 item 4: honest training ms/step WITH ResNetPL (weight 30).

Full big-lama fused GAN step (G+D+R1+FM+EMA) at the reference protocol
(256^2, batch 10), bf16, on the real TPU chip — measured twice: without and
with the ADE20k ResNet50-dilated perceptual loss in the generator loss
(every shipped config trains with resnet_pl weight 30; round-1's 142 ms/step
number excluded it). Random encoder weights (timing only; FLOPs identical).

Timing: N train steps chained through lax.scan inside ONE jit program ending
in a scalar transfer (relay-safe; see .claude/skills/verify/SKILL.md).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.models import make_generator, make_discriminator
from lama_tpu.losses.adversarial import make_discrim_loss
from lama_tpu.losses.perceptual import ResNetPL
from lama_tpu.training.state import create_train_state, make_optimizer
from lama_tpu.training.step import EMAConfig, InpaintingTrainStep, LossConfig

import os

BATCH, SIZE, CHAIN, REPEATS = 10, 256, 8, 3
# LAMA_PROBE_FP32=1 measures the reference's exact fp32 protocol
DTYPE = None if os.environ.get('LAMA_PROBE_FP32') == '1' else jnp.bfloat16


def build_step(with_pl):
    gen = make_generator(
        'ffc_resnet', input_nc=4, output_nc=3, ngf=64, n_downsampling=3,
        n_blocks=18, add_out_act='sigmoid', dtype=DTYPE,
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))
    disc = make_discriminator('pix2pixhd_nlayer', input_nc=3, ndf=64,
                              n_layers=4, dtype=DTYPE)
    adv = make_discrim_loss('r1', weight=10, gp_coef=0.001,
                            mask_as_fake_target=True, allow_scale_mask=True)
    g_tx = make_optimizer('adam', lr=1e-3, clip_grad_norm=1.0)
    d_tx = make_optimizer('adam', lr=1e-4, clip_grad_norm=1.0)
    pl = None
    if with_pl:
        pl = ResNetPL(weights_path=None, dtype=DTYPE, allow_random_weights=True)
    loss_cfg = LossConfig(resnet_pl_weight=30.0 if with_pl else 0.0)
    step = InpaintingTrainStep(gen, disc, adv, g_tx, d_tx, loss_config=loss_cfg,
                               ema=EMAConfig(enabled=True),
                               perceptual_fn=pl)
    return gen, disc, g_tx, d_tx, step


def time_one(with_pl):
    gen, disc, g_tx, d_tx, step = build_step(with_pl)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32))
    mask = jnp.zeros((BATCH, SIZE, SIZE, 1), np.float32)
    mask = mask.at[:, 64:160, 64:160, :].set(1.0)
    batch = {'image': img, 'mask': mask}
    state = jax.jit(lambda r: create_train_state(
        r, gen, disc, batch, g_tx, d_tx))(jax.random.PRNGKey(0))

    @jax.jit
    def chain(state, batch, key):
        def body(carry, i):
            st, k = carry
            k, sub = jax.random.split(k)
            st, metrics = step(st, batch, sub)
            return (st, k), metrics['gen_total']
        (state, _), losses = jax.lax.scan(body, (state, key), jnp.arange(CHAIN))
        return losses.mean().reshape(1, 1)

    tag = 'with-PL' if with_pl else 'no-PL'
    t0 = time.perf_counter()
    np.asarray(chain(state, batch, jax.random.PRNGKey(1)))
    print(f'[{tag}] compile+first: {time.perf_counter()-t0:.1f}s', flush=True)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(chain(state, batch, jax.random.PRNGKey(1)))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / CHAIN * 1000
    print(f'[{tag}] {ms:.1f} ms/step = {BATCH/ms*1000:.1f} img/s '
          f'(median of {REPEATS}x{CHAIN}-chain; raw {["%.2f" % t for t in times]})',
          flush=True)
    return ms


if __name__ == '__main__':
    no_pl = time_one(False)
    with_pl = time_one(True)
    print(f'ResNetPL overhead: +{with_pl-no_pl:.1f} ms '
          f'({(with_pl/no_pl-1)*100:.0f}%)', flush=True)
