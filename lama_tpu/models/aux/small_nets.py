"""AlexNet and SqueezeNet 1.1 feature trunks (torchvision layouts), NHWC —
the alternative LPIPS backbones ('net' in {'alex','squeeze'}; reference
evaluation/losses/lpips.py PNetLin supports vgg16/alex/squeeze with vendored
linear heads models/lpips_models/{alex,squeeze}.pth).

Conv layers are named features_<torch index> for mechanical weight conversion.
"""
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv import Conv2d, max_pool2d
from ...ops.pad import pad2d

Dtype = Any

# richzhang taps: relu outputs after each conv stage
ALEXNET_TAPS = (1, 4, 7, 9, 11)
ALEXNET_TAP_CHANNELS = (64, 192, 384, 256, 256)

# richzhang squeeze slices: relu1, fire3, fire5, fire6, fire7, fire8, fire9
SQUEEZE_TAPS = ('relu1', 'fire3', 'fire5', 'fire6', 'fire7', 'fire8', 'fire9')
SQUEEZE_TAP_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `features` trunk; returns relu activations at
    ALEXNET_TAPS."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        x = Conv2d(64, kernel_size=11, stride=4, padding=2, name='features_0',
                   dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        taps.append(x)                                   # relu1 (idx 1)
        x = max_pool2d(x, 3, 2)
        x = Conv2d(192, kernel_size=5, padding=2, name='features_3',
                   dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        taps.append(x)                                   # relu2 (idx 4)
        x = max_pool2d(x, 3, 2)
        x = Conv2d(384, kernel_size=3, padding=1, name='features_6',
                   dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        taps.append(x)                                   # relu3 (idx 7)
        x = Conv2d(256, kernel_size=3, padding=1, name='features_8',
                   dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        taps.append(x)                                   # relu4 (idx 9)
        x = Conv2d(256, kernel_size=3, padding=1, name='features_10',
                   dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        taps.append(x)                                   # relu5 (idx 11)
        return taps


class Fire(nn.Module):
    """SqueezeNet fire module: 1×1 squeeze + (1×1, 3×3) expand concat."""
    squeeze_ch: int
    expand1x1_ch: int
    expand3x3_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jax.nn.relu(Conv2d(self.squeeze_ch, kernel_size=1, name='squeeze',
                               dtype=self.dtype)(x))
        e1 = jax.nn.relu(Conv2d(self.expand1x1_ch, kernel_size=1, name='expand1x1',
                                dtype=self.dtype)(s))
        e3 = jax.nn.relu(Conv2d(self.expand3x3_ch, kernel_size=3, padding=1,
                                name='expand3x3', dtype=self.dtype)(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """torchvision SqueezeNet 1.1 `features` trunk; returns the 7 taps the
    LPIPS 'squeeze' variant calibrates."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        x = Conv2d(64, kernel_size=3, stride=2, name='features_0', dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        taps.append(x)                                   # relu1
        x = max_pool2d(x, 3, 2)
        x = Fire(16, 64, 64, name='features_3', dtype=self.dtype)(x)
        x = Fire(16, 64, 64, name='features_4', dtype=self.dtype)(x)
        taps.append(x)                                   # fire3
        x = max_pool2d(x, 3, 2)
        x = Fire(32, 128, 128, name='features_6', dtype=self.dtype)(x)
        x = Fire(32, 128, 128, name='features_7', dtype=self.dtype)(x)
        taps.append(x)                                   # fire5
        x = max_pool2d(x, 3, 2)
        x = Fire(48, 192, 192, name='features_9', dtype=self.dtype)(x)
        taps.append(x)                                   # fire6
        x = Fire(48, 192, 192, name='features_10', dtype=self.dtype)(x)
        taps.append(x)                                   # fire7
        x = Fire(64, 256, 256, name='features_11', dtype=self.dtype)(x)
        taps.append(x)                                   # fire8
        x = Fire(64, 256, 256, name='features_12', dtype=self.dtype)(x)
        taps.append(x)                                   # fire9
        return taps
