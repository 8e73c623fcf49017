"""Perceptual losses: ResNetPL (the high-receptive-field loss used by all
shipped LaMa configs, weight 30) and the classic VGG19 perceptual loss.

Reference: saicinpainting/training/losses/perceptual.py. Both hold frozen
(stop-gradient) backbone params captured in a closure so the loss is a pure
function suitable for use inside the jitted train step.
"""
import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.aux.resnet import ResNetDilatedEncoder
from ..models.aux.vgg import VGG19_CFG, VGGFeatures, imagenet_normalize
from ..ops.resize import interpolate

LOGGER = logging.getLogger(__name__)


class ResNetPL:
    """ADE20k ResNet50-dilated feature-matching loss
    (reference perceptual.py:88-113): ImageNet-normalise both images, sum MSE
    over the four stage feature maps. weight is applied by the caller
    (LossConfig.resnet_pl_weight) to mirror the config split."""

    def __init__(self, variables=None, weights_path: Optional[str] = None,
                 arch_encoder: str = 'resnet50dilated', dtype=None,
                 allow_random_weights: bool = False,
                 segmentation: bool = True):
        # segmentation=False selects imagenet (non-ADE20k) encoder weights in
        # the reference (ModelBuilder.get_encoder segmentation flag); the trunk
        # math is identical, only the weights file differs — the caller points
        # weights_path at the imagenet checkpoint in that case.
        self.segmentation = segmentation
        assert arch_encoder in ('resnet50dilated', 'resnet50'), arch_encoder
        self.model = ResNetDilatedEncoder(dilated=arch_encoder == 'resnet50dilated',
                                          dtype=dtype)
        if variables is None:
            variables = self.init_variables(weights_path, allow_random_weights)
        self.variables = jax.tree.map(jax.lax.stop_gradient, variables)

    def init_variables(self, weights_path, allow_random_weights=False):
        probe = jnp.zeros((1, 64, 64, 3))
        variables = self.model.init(jax.random.PRNGKey(0), probe, train=False)
        import os
        if weights_path and os.path.exists(weights_path):
            from ..training.convert import torch_to_flax
            import torch
            state = torch.load(weights_path, map_location='cpu', weights_only=False)
            if isinstance(state, dict) and 'state_dict' in state:
                state = state['state_dict']
            variables = torch_to_flax(state, variables, model=self.model,
                                      prefix='', strict=False)
            LOGGER.info(f'ResNetPL weights loaded from {weights_path}')
            return variables
        # the reference fails loudly when the ADE20k encoder weights are
        # missing (torch.load raises); random weights silently change training
        # dynamics, so they are opt-in for smoke tests only
        if not allow_random_weights:
            raise FileNotFoundError(
                f'ResNetPL encoder weights not found at {weights_path!r}. '
                'Download the ADE20k resnet50dilated encoder (see README) or '
                'pass allow_random_weights=True / set '
                'losses.resnet_pl.allow_random_weights=true for smoke tests.')
        LOGGER.warning(f'ResNetPL weights not found at {weights_path!r}; '
                       'using RANDOM weights (explicitly allowed) — loss '
                       'values will not match the reference.')
        return variables

    def __call__(self, pred, target):
        pred = imagenet_normalize(pred)
        target = imagenet_normalize(target)
        pred_feats = self.model.apply(self.variables, pred, train=False)
        target_feats = self.model.apply(self.variables, target, train=False)
        losses = [jnp.mean(jnp.square(p.astype(jnp.float32) - t.astype(jnp.float32)))
                  for p, t in zip(pred_feats, target_feats)]
        return jnp.sum(jnp.stack(losses))


def _vgg19_relu_taps(stop_after=30):
    """torch sequential indices of every ReLU output in the first
    `stop_after` layers of the VGG19 trunk (reference perceptual.py:54-60
    taps losses at each ReLU)."""
    taps = []
    idx = 0
    for v in VGG19_CFG:
        if idx >= stop_after:
            break
        if v == 'M':
            idx += 1
        else:
            idx += 1       # conv
            if idx < stop_after:
                taps.append(idx)  # relu output index
            idx += 1
    return tuple(taps)


class VGG19PerceptualLoss:
    """VGG19 (maxpool→avgpool) perceptual loss with mask-exclusion option
    (reference perceptual.py:14-85). Weight 0 in shipped configs; provided for
    parity. Returns per-sample loss vector (sum over tapped ReLUs)."""

    def __init__(self, variables=None, weights_path: Optional[str] = None,
                 normalize_inputs: bool = True, dtype=None):
        self.normalize_inputs = normalize_inputs
        taps = _vgg19_relu_taps(30)
        self.model = VGGFeatures(cfg=tuple(VGG19_CFG), tap_indices=taps,
                                 pool='avg', stop_after=30, dtype=dtype)
        if variables is None:
            probe = jnp.zeros((1, 64, 64, 3))
            variables = self.model.init(jax.random.PRNGKey(0), probe)
            if weights_path:
                import os
                if os.path.exists(weights_path):
                    from ..training.convert import torch_to_flax
                    import torch
                    state = torch.load(weights_path, map_location='cpu', weights_only=False)
                    variables = torch_to_flax(state, variables, model=self.model,
                                              prefix='', strict=False)
                else:
                    LOGGER.warning(f'VGG19 weights not found at {weights_path}; RANDOM weights.')
        self.variables = jax.tree.map(jax.lax.stop_gradient, variables)

    def partial_losses(self, input, target, mask=None):
        if self.normalize_inputs:
            input = imagenet_normalize(input)
            target = imagenet_normalize(target)
        feats_in = self.model.apply(self.variables, input)
        feats_tg = self.model.apply(self.variables, target)
        losses = []
        for fi, ft in zip(feats_in, feats_tg):
            loss = jnp.square(fi.astype(jnp.float32) - ft.astype(jnp.float32))
            if mask is not None:
                cur_mask = interpolate(mask, size=fi.shape[1:3], mode='bilinear',
                                       align_corners=False)
                loss = loss * (1 - cur_mask)
            losses.append(jnp.mean(loss, axis=(1, 2, 3)))
        return losses

    def __call__(self, input, target, mask=None):
        return jnp.sum(jnp.stack(self.partial_losses(input, target, mask)), axis=0)
