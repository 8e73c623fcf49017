"""The fused GAN training step — ONE jitted XLA program per batch.

TPU-first redesign of the reference's alternating Lightning optimization
(trainers/base.py:224-265 `_do_step` + trainers/default.py:88-175): instead of
two `training_step` invocations with `set_requires_grad` toggling and implicit
DDP allreduce, both player updates run inside a single `jax.jit`:

  1. generator forward (train-mode BN), losses: masked L1 + adversarial
     non-saturating + feature matching + optional perceptual (ResNetPL);
     `jax.grad` wrt generator params; optax update.
  2. re-forward with the *updated* generator (matching Lightning's call order,
     where optimizer_idx=1 re-runs forward after the G step), stop_gradient,
     discriminator loss with the R1 penalty via `jax.vjp` (double
     differentiation handled natively); optax update.
  3. generator EMA update (reference base.py:163-171: decay 0.999 every
     `period` steps after `start_step`).

Discriminator BN running stats update in both phases (torch behaviour: forward
in train() mode during the G step also advances running stats).

Under pjit this whole function is sharded over the mesh: batch along the
'data' axis, parameters replicated; XLA inserts the gradient psums (no DDP
machinery — SURVEY §2.9).
"""
import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses.adversarial import BaseAdversarialLoss
from ..losses.feature_matching import feature_matching_loss, masked_l1_loss
from ..ops.resize import interpolate
from .state import TrainState


def make_multiscale_noise(key, base, scales=6, scale_mode='bilinear'):
    """Gaussian noise pyramid upsampled to full res and stacked on channels
    (reference trainers/base.py:43-55). NHWC."""
    b, h, w, _ = base.shape
    cur_h, cur_w = h, w
    out = []
    align = False if scale_mode in ('bilinear', 'bicubic') else None
    for i in range(scales):
        sample = jax.random.normal(jax.random.fold_in(key, i),
                                   (b, cur_h, cur_w, 1), base.dtype)
        out.append(interpolate(sample, size=(h, w), mode=scale_mode,
                               align_corners=align))
        cur_h //= 2
        cur_w //= 2
    return jnp.concatenate(out, axis=-1)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights (configs/training/big-lama.yaml:7-24)."""
    l1_weight_known: float = 10.0
    l1_weight_missing: float = 0.0
    feature_matching_weight: float = 100.0
    feature_matching_pass_mask: bool = False
    resnet_pl_weight: float = 30.0
    perceptual_weight: float = 0.0


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    """reference trainers/base.py:92-97."""
    enabled: bool = True
    beta: float = 0.999
    start_step: int = 30000
    period: int = 10


class InpaintingTrainStep:
    """Builds the jittable `__call__(state, batch, rng) -> (state, metrics)`.

    generator/discriminator: flax modules with (x, train) -> ... signatures.
    adversarial: a lama_tpu.losses.adversarial loss object.
    perceptual_fn: optional (params-free) callable (pred, target) -> scalar,
      e.g. a frozen ResNetPL closure (weight already applied by caller or via
      loss_config.resnet_pl_weight).
    concat_mask: 4-channel generator input (trainers/default.py:67-68).
    """

    def __init__(self, generator, discriminator, adversarial: BaseAdversarialLoss,
                 g_tx, d_tx, loss_config: LossConfig = LossConfig(),
                 ema: EMAConfig = EMAConfig(),
                 perceptual_fn: Optional[Callable] = None,
                 vgg_perceptual_fn: Optional[Callable] = None,
                 concat_mask: bool = True,
                 image_to_discriminator: str = 'predicted_image',
                 distance_weighter: Optional[Callable] = None,
                 distance_weighted_mask_for_discr: bool = False,
                 fake_fakes_proba: float = 0.0,
                 fake_fakes_gen=None,
                 add_noise_kwargs: Optional[Dict[str, Any]] = None,
                 noise_fill_hole: bool = False,
                 r1_every: int = 1):
        self.generator = generator
        self.discriminator = discriminator
        self.adversarial = adversarial
        self.g_tx = g_tx
        self.d_tx = d_tx
        self.loss_config = loss_config
        self.ema = ema
        self.perceptual_fn = perceptual_fn
        self.vgg_perceptual_fn = vgg_perceptual_fn
        self.concat_mask = concat_mask
        self.image_to_discriminator = image_to_discriminator
        # mask distance weighting (trainers/default.py:82-84,110): the
        # supervision mask for L1/FM/VGG-PL is reweighted by distance from the
        # hole boundary; optionally also used for the adversarial G loss.
        self.distance_weighter = distance_weighter
        self.distance_weighted_mask_for_discr = distance_weighted_mask_for_discr
        # fake-fakes discriminator regularisation (default.py:72-80,157-166)
        self.fake_fakes_proba = fake_fakes_proba
        self.fake_fakes_gen = fake_fakes_gen
        if fake_fakes_proba > 1e-3:
            assert fake_fakes_gen is not None, 'fake_fakes_proba>0 needs a generator'
        # multiscale input noise (default.py:61-65, base.py:43-55)
        self.add_noise_kwargs = add_noise_kwargs
        self.noise_fill_hole = noise_fill_hole
        # lazy R1 (StyleGAN2 §Lazy regularization, arXiv 1912.04958 App. B):
        # compute the R1 double-grad only every `r1_every`-th step, scaled by
        # r1_every so the regularization expectation matches the every-step
        # protocol. OPT-IN (default 1 = the reference's every-step R1,
        # adversarial.py:71-79); the skipped steps drop the second
        # differentiation through the discriminator entirely (lax.cond runs
        # one branch on TPU). trainer.kwargs / losses.adversarial.r1_every.
        self.r1_every = int(r1_every)

    # ------------------------------------------------------------------ utils
    def _gen_input(self, img, mask, rng=None):
        masked = img * (1 - mask)
        if self.add_noise_kwargs is not None:
            assert rng is not None, 'add_noise_kwargs requires an rng'
            noise = make_multiscale_noise(rng, masked, **self.add_noise_kwargs)
            if self.noise_fill_hole:
                masked = masked + mask * noise[..., :masked.shape[-1]]
            masked = jnp.concatenate([masked, noise], axis=-1)
        if self.concat_mask:
            masked = jnp.concatenate([masked, mask], axis=-1)
        return masked

    def _to_discriminator(self, pred, img, mask):
        """batch[self.image_to_discriminator] (default.py:90,144)."""
        if self.image_to_discriminator == 'inpainted':
            return mask * pred + (1 - mask) * img
        return pred

    def generator_forward(self, g_params, g_stats, img, mask, train=True, rng=None):
        x = self._gen_input(img, mask, rng=rng)
        if train:
            pred, updates = self.generator.apply(
                {'params': g_params, 'batch_stats': g_stats}, x, train=True,
                mutable=['batch_stats'])
            return pred, updates['batch_stats']
        pred = self.generator.apply({'params': g_params, 'batch_stats': g_stats},
                                    x, train=False)
        return pred, g_stats

    def _disc_apply(self, d_params, d_stats, x):
        (score, feats), updates = self.discriminator.apply(
            {'params': d_params, 'batch_stats': d_stats}, x, train=True,
            mutable=['batch_stats'])
        return score, feats, updates['batch_stats']

    # ------------------------------------------------------------------ losses
    def _generator_loss(self, g_params, state: TrainState, img, mask, rng=None):
        cfg = self.loss_config
        pred, new_g_stats = self.generator_forward(g_params, state.g_stats, img, mask,
                                                   rng=rng)
        if self.distance_weighter is not None:
            # trainers/default.py:82-84: mask_for_losses from the current pred
            # (weighters stop_gradient internally)
            supervised_mask = self.distance_weighter(img, pred, mask)
        else:
            supervised_mask = mask

        # reference generator_loss supervises batch[image_to_discriminator]
        # throughout (default.py:90: predicted_img drives L1/PL/FM/adv)
        predicted_img = self._to_discriminator(pred, img, mask)

        l1 = masked_l1_loss(predicted_img, img, supervised_mask,
                            cfg.l1_weight_known, cfg.l1_weight_missing)
        total = l1
        metrics = {'gen_l1': l1}

        # classic VGG19 perceptual (weight 0 in shipped configs;
        # trainers/default.py:103-106)
        if self.vgg_perceptual_fn is not None and cfg.perceptual_weight > 0:
            pl_value = jnp.sum(self.vgg_perceptual_fn(
                predicted_img, img, supervised_mask)) * cfg.perceptual_weight
            total = total + pl_value
            metrics['gen_pl'] = pl_value

        real_score, real_feats, d_stats = self._disc_apply(state.d_params, state.d_stats, img)
        fake_score, fake_feats, d_stats = self._disc_apply(state.d_params, d_stats, predicted_img)

        # default.py:110: distance-weighted mask optionally drives the adv loss
        mask_for_discr = (supervised_mask if self.distance_weighted_mask_for_discr
                          else mask)
        adv_loss, adv_metrics = self.adversarial.generator_loss(fake_score, mask_for_discr)
        total = total + adv_loss
        metrics['gen_adv'] = adv_loss
        metrics.update({f'adv_{k}': v for k, v in adv_metrics.items()})

        if cfg.feature_matching_weight > 0:
            fm_mask = supervised_mask if cfg.feature_matching_pass_mask else None
            fm = feature_matching_loss(fake_feats, real_feats, mask=fm_mask) * cfg.feature_matching_weight
            total = total + fm
            metrics['gen_fm'] = fm

        if self.perceptual_fn is not None and cfg.resnet_pl_weight > 0:
            pl_val = self.perceptual_fn(predicted_img, img) * cfg.resnet_pl_weight
            total = total + pl_val
            metrics['gen_resnet_pl'] = pl_val

        return total, (metrics, new_g_stats, d_stats, pred)

    def _discriminator_loss(self, d_params, d_stats, img, pred_detached, mask,
                            fake_fakes=None, use_fake_fakes=None, step=None):
        def real_score_fn(r):
            score, _, _ = self._disc_apply(d_params, d_stats, r)
            return score

        if self.r1_every > 1 and step is not None:
            # lazy R1 (see __init__): the cond's taken branch is the only one
            # executed on device, so off-steps skip the vjp double-grad work
            def _with_r1(_):
                rp, gp = self.adversarial.r1_penalty(real_score_fn, img)
                return rp, gp * float(self.r1_every)

            def _without_r1(_):
                return real_score_fn(img), jnp.zeros((), jnp.float32)

            real_pred, gp = jax.lax.cond(step % self.r1_every == 0,
                                         _with_r1, _without_r1, None)
        else:
            real_pred, gp = self.adversarial.r1_penalty(real_score_fn, img)
        # advance BN stats: real pass then fake pass (torch call order,
        # trainers/default.py:147-148); XLA CSEs the duplicate real forward.
        _, _, stats1 = self._disc_apply(d_params, d_stats, img)
        fake_pred, _, stats2 = self._disc_apply(d_params, stats1, pred_detached)

        loss, metrics = self.adversarial.discriminator_loss(real_pred, fake_pred, gp, mask)

        if fake_fakes is not None:
            # default.py:159-173: an extra full discriminator_loss term on the
            # blended "fake fakes" (the reference recomputes the R1 penalty for
            # the same reals, so the gp genuinely enters twice when active).
            # `use_fake_fakes` is a 0/1 scalar (the per-step Bernoulli draw);
            # scaling the term and blending the BN stats reproduces the
            # conditional without data-dependent control flow under jit.
            ff_pred, _, stats3 = self._disc_apply(d_params, stats2, fake_fakes)
            ff_loss, _ = self.adversarial.discriminator_loss(real_pred, ff_pred, gp, mask)
            use = use_fake_fakes.astype(loss.dtype)
            loss = loss + use * ff_loss
            metrics['discr_adv_fake_fakes'] = use * ff_loss
            stats2 = jax.tree.map(lambda new, old: use * new + (1 - use) * old,
                                  stats3, stats2)

        return loss, (metrics, stats2)

    # ------------------------------------------------------------------ step
    def __call__(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                 rng: jax.Array):
        img, mask = batch['image'], batch['mask']
        metrics = {}
        rng_g, rng_d, rng_ff = jax.random.split(rng, 3)

        # ---- generator step
        (g_loss, (g_metrics, g_stats, d_stats_after_g, _)), g_grads = \
            jax.value_and_grad(self._generator_loss, has_aux=True)(
                state.g_params, state, img, mask, rng_g)
        g_updates, g_opt_state = self.g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        metrics.update(g_metrics)
        metrics['gen_total'] = g_loss

        # ---- fake fakes for discriminator regularisation (default.py:73-80)
        fake_fakes = use_ff = None
        if self.fake_fakes_proba > 1e-3:
            k_use, k_gen = jax.random.split(rng_ff)
            use_ff = jax.random.uniform(k_use, ()) < self.fake_fakes_proba
            fake_fakes, _ = self.fake_fakes_gen(k_gen, img, mask)

        # ---- discriminator step (fresh forward through the UPDATED generator)
        pred, g_stats = self.generator_forward(g_params, g_stats, img, mask, rng=rng_d)
        pred_detached = jax.lax.stop_gradient(
            self._to_discriminator(pred, img, mask))
        (d_loss, (d_metrics, d_stats)), d_grads = \
            jax.value_and_grad(self._discriminator_loss, has_aux=True)(
                state.d_params, d_stats_after_g, img, pred_detached, mask,
                fake_fakes, use_ff, state.step)
        d_updates, d_opt_state = self.d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        metrics.update({f'discr_{k}' if not k.startswith('discr') else k: v
                        for k, v in d_metrics.items()})
        metrics['discr_total'] = d_loss

        # ---- generator EMA
        ema_params = state.ema_params
        if self.ema.enabled and ema_params is not None:
            step = state.step
            do_update = jnp.logical_and(step >= self.ema.start_step,
                                        step % self.ema.period == 0)
            beta = jnp.where(do_update, self.ema.beta, 1.0)
            ema_params = jax.tree.map(
                lambda e, p: e * beta + p * (1.0 - beta), ema_params, g_params)

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params, g_stats=g_stats,
            d_params=d_params, d_stats=d_stats,
            g_opt_state=g_opt_state, d_opt_state=d_opt_state,
            ema_params=ema_params)
        return new_state, metrics
