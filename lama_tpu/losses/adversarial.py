"""Adversarial GAN losses — functional JAX re-design of the reference
saicinpainting/training/losses/adversarial.py.

Key difference from the torch version: the R1 gradient penalty
(adversarial.py:71-79, `torch.autograd.grad(create_graph=True)`) is expressed
with `jax.vjp` over a pure discriminator closure — double differentiation
(d(loss incl. gp)/d(params)) then falls out of ordinary `jax.grad` on the
training step; no `requires_grad` mutation is needed.

big-lama config (configs/training/big-lama.yaml:14-19): kind=r1, weight=10,
gp_coef=0.001, mask_as_fake_target=true, allow_scale_mask=true.
"""
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import max_pool2d
from ..ops.resize import interpolate


def _softplus(x):
    return jax.nn.softplus(x)


class BaseAdversarialLoss:
    def interpolate_mask(self, mask, shape):
        assert mask is not None
        if tuple(shape) != tuple(mask.shape[1:3]):
            assert self.allow_scale_mask
            if self.mask_scale_mode == 'maxpool':
                _, h, w, _ = mask.shape
                fh, fw = h // shape[0], w // shape[1]
                return max_pool2d(mask, (fh, fw))
            return interpolate(mask, size=shape, mode=self.mask_scale_mode)
        return mask


class NonSaturatingWithR1(BaseAdversarialLoss):
    """Softplus GAN loss with R1 gradient penalty on reals
    (reference adversarial.py:81-143)."""

    def __init__(self, gp_coef=5, weight=1, mask_as_fake_target=False,
                 allow_scale_mask=False, mask_scale_mode='nearest',
                 extra_mask_weight_for_gen=0, use_unmasked_for_gen=True,
                 use_unmasked_for_discr=True):
        self.gp_coef = gp_coef
        self.weight = weight
        assert use_unmasked_for_gen or (not use_unmasked_for_discr)
        assert use_unmasked_for_discr or (not mask_as_fake_target)
        self.use_unmasked_for_gen = use_unmasked_for_gen
        self.use_unmasked_for_discr = use_unmasked_for_discr
        self.mask_as_fake_target = mask_as_fake_target
        self.allow_scale_mask = allow_scale_mask
        self.mask_scale_mode = mask_scale_mode
        self.extra_mask_weight_for_gen = extra_mask_weight_for_gen

    def generator_loss(self, discr_fake_pred, mask=None) -> Tuple[jnp.ndarray, Dict]:
        fake_loss = _softplus(-discr_fake_pred)
        if (self.mask_as_fake_target and self.extra_mask_weight_for_gen > 0) or \
                not self.use_unmasked_for_gen:
            mask = self.interpolate_mask(mask, discr_fake_pred.shape[1:3])
            if not self.use_unmasked_for_gen:
                fake_loss = fake_loss * mask
            else:
                fake_loss = fake_loss * (1 + mask * self.extra_mask_weight_for_gen)
        return jnp.mean(fake_loss) * self.weight, {}

    def r1_penalty(self, discr_real_fn: Callable, real_batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (discr_real_pred, R1 penalty). `discr_real_fn` maps images to
        score maps; the vjp against ones == grad of pred.sum() wrt images,
        and remains differentiable for the outer d(params) grad."""
        discr_real_pred, vjp_fn = jax.vjp(discr_real_fn, real_batch)
        (grad_real,) = vjp_fn(jnp.ones_like(discr_real_pred))
        b = grad_real.shape[0]
        grad_penalty = jnp.mean(jnp.sum(jnp.square(grad_real.reshape(b, -1).astype(jnp.float32)), axis=1))
        return discr_real_pred, grad_penalty

    def discriminator_loss(self, discr_real_pred, discr_fake_pred, grad_penalty,
                           mask=None) -> Tuple[jnp.ndarray, Dict]:
        real_loss = _softplus(-discr_real_pred)
        gp = grad_penalty * self.gp_coef
        fake_loss = _softplus(discr_fake_pred)

        if not self.use_unmasked_for_discr or self.mask_as_fake_target:
            mask = self.interpolate_mask(mask, discr_fake_pred.shape[1:3])
            fake_loss = fake_loss * mask
            if self.mask_as_fake_target:
                fake_loss = fake_loss + (1 - mask) * _softplus(-discr_fake_pred)

        sum_discr_loss = jnp.mean(real_loss + fake_loss) + gp
        metrics = dict(discr_real_out=jnp.mean(discr_real_pred),
                       discr_fake_out=jnp.mean(discr_fake_pred),
                       discr_real_gp=gp)
        return sum_discr_loss, metrics


class BCEAdversarialLoss(BaseAdversarialLoss):
    """Mask-target BCE loss, kind='bce' (reference adversarial.py:145-169)."""

    def __init__(self, weight):
        self.weight = weight

    @staticmethod
    def _bce_with_logits(pred, target):
        return jnp.mean(jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))))

    def generator_loss(self, discr_fake_pred, mask=None) -> Tuple[jnp.ndarray, Dict]:
        fake_loss = self._bce_with_logits(discr_fake_pred, jnp.zeros_like(discr_fake_pred))
        return fake_loss * self.weight, {}

    def r1_penalty(self, discr_real_fn, real_batch):
        return discr_real_fn(real_batch), jnp.float32(0.0)

    def discriminator_loss(self, discr_real_pred, discr_fake_pred, grad_penalty,
                           mask=None) -> Tuple[jnp.ndarray, Dict]:
        mask = self.interpolate_mask(mask, discr_fake_pred.shape[1:3])
        loss = (self._bce_with_logits(discr_real_pred, jnp.zeros_like(discr_real_pred)) +
                self._bce_with_logits(discr_fake_pred, mask)) / 2
        metrics = dict(discr_real_out=jnp.mean(discr_real_pred),
                       discr_fake_out=jnp.mean(discr_fake_pred),
                       discr_real_gp=jnp.float32(0.0))
        return loss, metrics


def make_discrim_loss(kind, **kwargs):
    if kind == 'r1':
        return NonSaturatingWithR1(**kwargs)
    if kind == 'bce':
        return BCEAdversarialLoss(**kwargs)
    raise ValueError(f'Unknown adversarial loss kind {kind}')
