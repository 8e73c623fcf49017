"""Round-4 per-stage attribution of the fused GAN train step
(VERDICT r3 item 2).

Big-lama + pix2pixhd-D at the reference protocol (256², batch 10, bf16),
scan-chained on the real chip (_t_train_pl.py methodology). Variants
(PL off unless said; slices are differences, modulo XLA overlap):

  full       all losses incl. ResNetPL 30 (the shipped protocol; r3: 138.9)
  base       PL off (r3: 121.7)               -> PL slice = full - base
  no_r1      R1 penalty replaced by a plain real forward -> R1 slice
  no_fm      feature_matching_weight = 0               -> FM slice
  r1_every4  the LAZY R1 lever (r1_every=4, scaled)   -> candidate win
  g_only     generator update only (G fwd+bwd+adam, incl. D fwds for adv/FM)
  d_only     discriminator update only (G fwd no-grad + D fwd/bwd + R1 + adam)
  fwd_g      generator forward only, no grads          -> forward floor
  sgd        adam -> plain sgd on both players         -> optimizer slice

Run: timeout 4000 python probes/_t_train_profile.py [variants,comma,list]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from lama_tpu.losses.adversarial import make_discrim_loss
from lama_tpu.models import make_discriminator, make_generator
from lama_tpu.training.state import create_train_state, make_optimizer
from lama_tpu.training.step import EMAConfig, InpaintingTrainStep, LossConfig
from lama_tpu.utils import enable_compilation_cache

BATCH, SIZE, CHAIN, REPEATS = 10, 256, 8, 3
DTYPE = jnp.bfloat16


def build_step(with_pl=False, fm_weight=100.0, r1_every=1, no_r1=False,
               sgd=False, serving_mode=None, spectral_kwargs=None,
               remat_blocks=False):
    gen = make_generator(
        'ffc_resnet', input_nc=4, output_nc=3, ngf=64, n_downsampling=3,
        n_blocks=18, add_out_act='sigmoid', dtype=DTYPE,
        serving_mode=serving_mode, spectral_kwargs=spectral_kwargs,
        remat_blocks=remat_blocks,
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))
    disc = make_discriminator('pix2pixhd_nlayer', input_nc=3, ndf=64,
                              n_layers=4, dtype=DTYPE)
    adv = make_discrim_loss('r1', weight=10, gp_coef=0.001,
                            mask_as_fake_target=True, allow_scale_mask=True)
    if no_r1:
        # surgical: plain real forward instead of the vjp double-grad
        adv.r1_penalty = lambda fn, real: (fn(real), jnp.zeros((), jnp.float32))
    if sgd:
        g_tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-3))
        d_tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-4))
    else:
        g_tx = make_optimizer('adam', lr=1e-3, clip_grad_norm=1.0)
        d_tx = make_optimizer('adam', lr=1e-4, clip_grad_norm=1.0)
    pl = None
    if with_pl:
        from lama_tpu.losses.perceptual import ResNetPL
        pl = ResNetPL(weights_path=None, dtype=DTYPE, allow_random_weights=True)
    loss_cfg = LossConfig(resnet_pl_weight=30.0 if with_pl else 0.0,
                          feature_matching_weight=fm_weight)
    step = InpaintingTrainStep(gen, disc, adv, g_tx, d_tx, loss_config=loss_cfg,
                               ema=EMAConfig(enabled=True), perceptual_fn=pl,
                               r1_every=r1_every)
    return gen, disc, g_tx, d_tx, step


def time_chain(tag, state, batch, body_fn):
    @jax.jit
    def chain(state, batch, key):
        def body(carry, i):
            st, k = carry
            k, sub = jax.random.split(k)
            st, out = body_fn(st, batch, sub)
            return (st, k), out
        (state, _), outs = jax.lax.scan(body, (state, key), jnp.arange(CHAIN))
        return outs.mean().reshape(1, 1)

    t0 = time.perf_counter()
    np.asarray(chain(state, batch, jax.random.PRNGKey(1)))
    print(f'[{tag}] compile+first: {time.perf_counter() - t0:.1f}s', flush=True)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(chain(state, batch, jax.random.PRNGKey(1)))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / CHAIN * 1000
    print(f'[{tag}] {ms:.1f} ms/step = {BATCH / ms * 1000:.1f} img/s '
          f'(raw {["%.2f" % t for t in times]})', flush=True)
    return ms


def make_state(gen, disc, g_tx, d_tx, batch):
    return jax.jit(lambda r: create_train_state(
        r, gen, disc, batch, g_tx, d_tx))(jax.random.PRNGKey(0))


def main():
    enable_compilation_cache()
    only = set(sys.argv[1].split(',')) if len(sys.argv) > 1 else None
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32))
    mask = jnp.zeros((BATCH, SIZE, SIZE, 1), np.float32)
    mask = mask.at[:, 64:160, 64:160, :].set(1.0)
    batch = {'image': img, 'mask': mask}
    results = {}

    def run(tag, **kw):
        if only is not None and tag not in only:
            return
        gen, disc, g_tx, d_tx, step = build_step(**kw)
        state = make_state(gen, disc, g_tx, d_tx, batch)
        results[tag] = time_chain(
            tag, state, batch,
            lambda st, b, k: (lambda s, m: (s, m['gen_total']))(*step(st, b, k)))

    run('full', with_pl=True)
    if only is not None and 'full_bf16store' in only:
        # measured-quality candidate: bf16-stored spectral DFT intermediates
        # in the TRAIN step (forward and backward einsums both store bf16) —
        # the serving win (+9.5%, BASELINE.md round 4) applied to training.
        # MEASURED NOISE (−0.6%, BASELINE.md round 4): 32² frequency tensors
        # are too small at the training protocol.
        from lama_tpu.ops.serving_mode import ServingMode
        run('full_bf16store', with_pl=True,
            serving_mode=ServingMode(spectral_bf16_store=True))
    if only is not None and 'full_g16' in only:
        # round-5 lever (train HLO audit, BASELINE.md): bf16-stored spectral
        # BACKWARD intermediates (custom-vjp adjoint DFTs). The audit charges
        # 8.51 GB of the 53.9 GB writes to f32 spectral backward tensors ->
        # ceiling ~5 ms if fully halved. Numerics-changing for gradients:
        # ship only behind the 400-step trajectory gate.
        run('full_g16', with_pl=True,
            spectral_kwargs=dict(spectral_bf16_grads=True))
    if only is not None and 'full_remat' in only:
        # round-5 lever #2 from the train HLO audit: jax.checkpoint each
        # bottleneck block — trades the 7.4 GB of fwd-side residual writes
        # for recompute (itself HBM-bound; audit predicts a wash — measure
        # once). Numerics-identical (tests/test_ffc.py remat test).
        run('full_remat', with_pl=True, remat_blocks=True)
    if only is not None and 'full_g16_remat' in only:
        run('full_g16_remat', with_pl=True, remat_blocks=True,
            spectral_kwargs=dict(spectral_bf16_grads=True))
    run('base')
    run('no_r1', no_r1=True)
    run('no_fm', fm_weight=0.0)
    run('r1_every4', r1_every=4)
    run('sgd', sgd=True)

    # ---- partial steps (probe-side compositions of the step's internals)
    gen, disc, g_tx, d_tx, step = build_step()
    state = make_state(gen, disc, g_tx, d_tx, batch)

    if only is None or 'g_only' in only:
        def g_only(st, b, k):
            (g_loss, (m, g_stats, d_stats, _)), g_grads = jax.value_and_grad(
                step._generator_loss, has_aux=True)(st.g_params, st,
                                                    b['image'], b['mask'], k)
            upd, g_opt = g_tx.update(g_grads, st.g_opt_state, st.g_params)
            new = st.replace(g_params=optax.apply_updates(st.g_params, upd),
                             g_stats=g_stats, g_opt_state=g_opt,
                             step=st.step + 1)
            return new, g_loss
        results['g_only'] = time_chain('g_only', state, batch, g_only)

    if only is None or 'd_only' in only:
        def d_only(st, b, k):
            pred, g_stats = step.generator_forward(st.g_params, st.g_stats,
                                                   b['image'], b['mask'], rng=k)
            pred_det = jax.lax.stop_gradient(pred)
            (d_loss, (m, d_stats)), d_grads = jax.value_and_grad(
                step._discriminator_loss, has_aux=True)(
                st.d_params, st.d_stats, b['image'], pred_det, b['mask'])
            upd, d_opt = d_tx.update(d_grads, st.d_opt_state, st.d_params)
            new = st.replace(d_params=optax.apply_updates(st.d_params, upd),
                             d_stats=d_stats, d_opt_state=d_opt,
                             g_stats=g_stats, step=st.step + 1)
            return new, d_loss
        results['d_only'] = time_chain('d_only', state, batch, d_only)

    if only is None or 'fwd_g' in only:
        def fwd_g(st, b, k):
            pred, g_stats = step.generator_forward(st.g_params, st.g_stats,
                                                   b['image'], b['mask'], rng=k)
            return st.replace(g_stats=g_stats, step=st.step + 1), pred.mean()
        results['fwd_g'] = time_chain('fwd_g', state, batch, fwd_g)

    print('\nresults (ms/step):', {k: round(v, 1) for k, v in results.items()},
          flush=True)
    if {'full', 'base', 'no_r1', 'no_fm', 'sgd'} <= set(results):
        b = results['base']
        print(f"attribution: PL={results['full'] - b:.1f} "
              f"R1={b - results['no_r1']:.1f} FM={b - results['no_fm']:.1f} "
              f"adam-vs-sgd={b - results['sgd']:.1f} "
              f"G-only={results.get('g_only', float('nan')):.1f} "
              f"D-only={results.get('d_only', float('nan')):.1f} "
              f"G-fwd={results.get('fwd_g', float('nan')):.1f} "
              f"lazyR1(k=4)={b - results.get('r1_every4', float('nan')):.1f} saved",
              flush=True)


if __name__ == '__main__':
    main()
