"""FID: InceptionV3 pooled activations (device) + Fréchet distance (host).

Reference: evaluation/losses/base_loss.py:127-218 + losses/fid/. The sqrtm
stays on host scipy exactly as in the reference (SURVEY §2.9 note) — it is a
one-off O(2048³) op, not worth a device implementation.
"""
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.aux.inception import FIDInceptionV3

LOGGER = logging.getLogger(__name__)


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """Fréchet distance between two gaussians (reference base_loss.py:127-153,
    incl. the singular-covariance eps fallback)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if isinstance(covmean, tuple):  # older scipy (disp API) compatibility
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        LOGGER.warning(f'fid calculation produces singular product; '
                       f'adding {eps} to diagonal of cov estimates')
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))

    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f'Imaginary component {m}')
        covmean = covmean.real

    return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
            - 2 * np.trace(covmean))


class InceptionActivations:
    """Frozen FID-InceptionV3 closure: NHWC [0,1] images -> (B, 2048)."""

    _singleton = None

    def __init__(self, variables=None, weights_path: Optional[str] = None, dtype=None):
        self.model = FIDInceptionV3(output_blocks=(3,), dtype=dtype)
        if variables is None:
            variables = self.model.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 299, 299, 3)), train=False)
            if weights_path and os.path.exists(weights_path):
                import torch
                from ..training.convert import torch_to_flax
                state = torch.load(weights_path, map_location='cpu', weights_only=False)
                variables = torch_to_flax(state, variables, model=self.model,
                                          prefix='', strict=False)
                LOGGER.info(f'FID inception weights loaded from {weights_path}')
            else:
                LOGGER.warning('FID inception weights unavailable '
                               f'({weights_path}); RANDOM weights — FID values '
                               'are only self-consistent, not comparable.')
        self.variables = jax.tree.map(jax.lax.stop_gradient, variables)
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x, train=False)[0])

    @classmethod
    def get(cls, **kwargs):
        """Process-wide singleton (reference FIDScore caches its inception)."""
        if cls._singleton is None:
            weights_path = kwargs.pop('weights_path', None) or \
                os.environ.get('LAMA_FID_INCEPTION_WEIGHTS')
            cls._singleton = cls(weights_path=weights_path, **kwargs)
        return cls._singleton

    def __call__(self, images) -> jnp.ndarray:
        out = self._apply(self.variables, images)
        return out.reshape(out.shape[0], -1)


def fid_from_activations(act1: np.ndarray, act2: np.ndarray) -> float:
    mu1, sigma1 = act1.mean(axis=0), np.cov(act1, rowvar=False)
    mu2, sigma2 = act2.mean(axis=0), np.cov(act2, rowvar=False)
    return float(calculate_frechet_distance(mu1, sigma1, mu2, sigma2))
