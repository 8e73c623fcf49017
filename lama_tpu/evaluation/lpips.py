"""LPIPS (net-lin, vgg16) — the perceptual-distance metric used by the
evaluation protocol (reference evaluation/losses/lpips.py: PerceptualLoss →
DistModel → PNetLin with NetLinLayer 1×1 calibration convs over vgg16 taps).

Pipeline (richzhang semantics):
  scale input [0,1]→[-1,1] → shift/scale by the LPIPS constants →
  vgg16 features at relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 →
  channel-unit-normalise each tap → squared diff → 1×1 linear head (positive
  weights, no bias) → spatial mean → sum over taps.

Weights: vgg16 backbone via torchvision state_dict (torch→flax converter),
linear heads via the vendored lpips .pth (reference models/lpips_models/
vgg.pth, keys lin0.model.1.weight ... lin4.model.1.weight). Both paths are
optional; random init is flagged loudly since metric values are then
meaningless for cross-paper comparison.
"""
import logging
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.aux.small_nets import (ALEXNET_TAP_CHANNELS, AlexNetFeatures,
                                     SQUEEZE_TAP_CHANNELS, SqueezeNetFeatures)
from ..models.aux.vgg import VGG16_CFG, VGG16_LPIPS_TAPS, VGGFeatures

LOGGER = logging.getLogger(__name__)

# richzhang ScalingLayer constants (lpips.py PNetLin)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_VGG16_TAP_CHANNELS = (64, 128, 256, 512, 512)

_LPIPS_LIN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              'resources', 'lpips_lin')


def default_lin_weights_path(net: str) -> str:
    """Vendored LPIPS calibration heads (reference models/lpips_models/)."""
    return os.path.join(_LPIPS_LIN_DIR, f'{net}.npz')


def normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS:
    def __init__(self, backbone_variables=None, lin_weights=None,
                 vgg_weights_path: Optional[str] = None,
                 lin_weights_path: Optional[str] = None, net: str = 'vgg',
                 dtype=None):
        self.net = net
        if net == 'vgg':
            self.model = VGGFeatures(cfg=tuple(VGG16_CFG),
                                     tap_indices=VGG16_LPIPS_TAPS,
                                     pool='max', dtype=dtype)
            self.tap_channels = _VGG16_TAP_CHANNELS
        elif net == 'alex':
            self.model = AlexNetFeatures(dtype=dtype)
            self.tap_channels = ALEXNET_TAP_CHANNELS
        elif net == 'squeeze':
            self.model = SqueezeNetFeatures(dtype=dtype)
            self.tap_channels = SQUEEZE_TAP_CHANNELS
        else:
            raise ValueError(f'Unknown LPIPS net {net}')
        if backbone_variables is None:
            backbone_variables = self._init_backbone(vgg_weights_path)
        self.backbone_variables = jax.tree.map(jax.lax.stop_gradient, backbone_variables)
        if lin_weights is None:
            lin_weights = self._init_lin(lin_weights_path)
        self.lin_weights = [jax.lax.stop_gradient(jnp.asarray(w)) for w in lin_weights]

    def _init_backbone(self, path):
        variables = self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        if path and os.path.exists(path):
            import torch
            from ..training.convert import torch_to_flax
            state = torch.load(path, map_location='cpu', weights_only=False)
            variables = torch_to_flax(state, variables, model=self.model,
                                      prefix='', strict=False)
            LOGGER.info(f'LPIPS vgg16 backbone loaded from {path}')
        else:
            LOGGER.warning('LPIPS vgg16 backbone weights unavailable '
                           f'({path}); using RANDOM weights — LPIPS values '
                           'will not be comparable to published numbers.')
        return variables

    def _init_lin(self, path):
        if not path:
            # the calibration heads are tiny vendored weights (reference
            # models/lpips_models/*.pth, re-serialised as npz) — load them by
            # default so LPIPS aggregation matches richzhang's released model
            path = default_lin_weights_path(self.net)
        if path and os.path.exists(path):
            if path.endswith('.npz'):
                state = dict(np.load(path))
            else:
                import torch
                state = {k: v.detach().numpy() for k, v in
                         torch.load(path, map_location='cpu',
                                    weights_only=False).items()}
            weights = []
            for i in range(len(self.tap_channels)):
                w = np.asarray(state[f'lin{i}.model.1.weight'])  # (1, C, 1, 1)
                weights.append(np.transpose(w, (2, 3, 1, 0)).astype(np.float32))
            LOGGER.info(f'LPIPS linear heads loaded from {path}')
            return weights
        LOGGER.warning(f'LPIPS linear heads unavailable ({path}); using ones.')
        return [np.ones((1, 1, c, 1), np.float32) / c for c in self.tap_channels]

    def _features(self, x):
        # [0,1] -> [-1,1] -> lpips scaling
        x = 2 * x - 1
        x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        return self.model.apply(self.backbone_variables, x)

    def __call__(self, pred, target):
        """NHWC [0,1] images -> per-image LPIPS distance (B,)."""
        feats_p = self._features(pred)
        feats_t = self._features(target)
        total = 0.0
        for fp, ft, w in zip(feats_p, feats_t, self.lin_weights):
            diff = jnp.square(normalize_tensor(fp.astype(jnp.float32)) -
                              normalize_tensor(ft.astype(jnp.float32)))
            val = jax.lax.conv_general_dilated(
                diff, jnp.abs(w), (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            total = total + jnp.mean(val, axis=(1, 2, 3))
        return total
