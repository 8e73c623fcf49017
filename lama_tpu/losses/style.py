"""Gatys-style VGG19 content loss (reference losses/style_loss.py:6-155,
unused by shipped configs but part of the public loss surface): L1 distance
between relu{1..5}_1 VGG19 activations."""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..models.aux.vgg import VGG19_CFG, VGGFeatures


def _relu_n_1_taps():
    """torch sequential indices of relu1_1, relu2_1, ..., relu5_1 outputs."""
    taps = []
    idx = 0
    first_in_stage = True
    for v in VGG19_CFG:
        if v == 'M':
            idx += 1
            first_in_stage = True
        else:
            idx += 1  # conv
            if first_in_stage:
                taps.append(idx)  # relu output
                first_in_stage = False
            idx += 1  # relu
    return tuple(taps)


class StylePerceptualLoss:
    def __init__(self, variables=None, weights=(1.0, 1.0, 1.0, 1.0, 1.0),
                 vgg_weights_path: Optional[str] = None, dtype=None):
        self.weights = weights
        taps = _relu_n_1_taps()
        self.model = VGGFeatures(cfg=tuple(VGG19_CFG), tap_indices=taps,
                                 pool='max', dtype=dtype)
        if variables is None:
            variables = self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
            if vgg_weights_path:
                import os
                if os.path.exists(vgg_weights_path):
                    import torch
                    from ..training.convert import torch_to_flax
                    state = torch.load(vgg_weights_path, map_location='cpu',
                                       weights_only=False)
                    variables = torch_to_flax(state, variables, model=self.model,
                                              strict=False)
        self.variables = jax.tree.map(jax.lax.stop_gradient, variables)

    def __call__(self, x, y):
        fx = self.model.apply(self.variables, x)
        fy = self.model.apply(self.variables, y)
        loss = 0.0
        for w, a, b in zip(self.weights, fx, fy):
            loss = loss + w * jnp.mean(jnp.abs(a.astype(jnp.float32) -
                                               b.astype(jnp.float32)))
        return loss
