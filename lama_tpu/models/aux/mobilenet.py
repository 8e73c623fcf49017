"""MobileNetV2-dilated ADE20k encoder (reference models/ade20k/mobilenet.py +
base.py:459-511 MobileNetV2Dilated) — the lightweight alternative to
resnet50dilated in the segmentation module (pairs with the C1-DeepSup
decoder). NHWC flax, ReLU6 activations, dilate_scale=8 surgery:
features[7:14] get dilation 2 (their stride-2 dw conv → stride 1, d=1),
features[14:] dilation 4 (stride-2 dw conv → stride 1, d=2).

Names mirror torch: features_<i> with inner conv_<j> sequential indices.
"""
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv import Conv2d
from ...ops.norm import BatchNorm

Dtype = Any


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


class ConvBN(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, kernel_size=self.kernel_size, stride=self.stride,
                   padding=self.padding, use_bias=False, name='conv_0',
                   dtype=self.dtype)(x)
        x = BatchNorm(name='conv_1')(x, use_running_average=not train)
        return relu6(x)


class InvertedResidual(nn.Module):
    """reference mobilenet.py:38-76; `dilation` implements the dilate surgery
    on the depthwise conv (stride forced to 1 when dilation > 1)."""
    in_ch: int
    out_ch: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = round(self.in_ch * self.expand_ratio)
        stride = 1 if self.dilation > 1 else self.stride
        d = max(self.dilation // 2, 1) if self.stride == 2 else self.dilation
        # torch decides the residual from the ORIGINAL stride, before surgery
        use_res = self.stride == 1 and self.in_ch == self.out_ch

        h = x
        idx = 0
        if self.expand_ratio != 1:
            h = Conv2d(hidden, kernel_size=1, use_bias=False, name=f'conv_{idx}',
                       dtype=self.dtype)(h)
            h = BatchNorm(name=f'conv_{idx + 1}')(h, use_running_average=not train)
            h = relu6(h)
            idx += 3
        h = Conv2d(hidden, kernel_size=3, stride=stride, padding=d, dilation=d,
                   groups=hidden, use_bias=False, name=f'conv_{idx}',
                   dtype=self.dtype)(h)
        h = BatchNorm(name=f'conv_{idx + 1}')(h, use_running_average=not train)
        h = relu6(h)
        idx += 3
        h = Conv2d(self.out_ch, kernel_size=1, use_bias=False, name=f'conv_{idx}',
                   dtype=self.dtype)(h)
        h = BatchNorm(name=f'conv_{idx + 1}')(h, use_running_average=not train)
        return x + h if use_res else h


class MobileNetV2DilatedEncoder(nn.Module):
    """Feature trunk without the classifier and without the final 1×1
    (features[:-1] in the reference wrapper), dilate_scale=8. Returns the
    feature maps at down_idx (2, 4, 7, 14) plus the final map."""
    width_mult: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        settings = [  # t, c, n, s
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        down_idx = [2, 4, 7, 14]

        x = ConvBN(int(32 * self.width_mult), stride=2, name='features_0',
                   dtype=self.dtype)(x, train=train)
        outs = []
        idx = 1
        in_ch = int(32 * self.width_mult)
        for t, c, n, s in settings:
            out_ch = int(c * self.width_mult)
            for i in range(n):
                if idx >= 14:
                    dilation = 4
                elif idx >= 7:
                    dilation = 2
                else:
                    dilation = 1
                x = InvertedResidual(in_ch, out_ch, stride=s if i == 0 else 1,
                                     expand_ratio=t, dilation=dilation,
                                     name=f'features_{idx}',
                                     dtype=self.dtype)(x, train=train)
                in_ch = out_ch
                if idx in down_idx:
                    outs.append(x)
                idx += 1
        outs.append(x)
        return outs
