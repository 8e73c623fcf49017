"""ADE20k ResNet50-dilated encoder — the "high receptive field" perceptual
backbone used by ResNetPL (weight 30 in every shipped LaMa config).

Faithful NHWC re-implementation of the CSAIL ResNet (reference
models/ade20k/resnet.py:95-160: deep 3-conv stem 64/64/128, bottleneck layers
[3,4,6,3]) with the dilation surgery of ResnetDilated (base.py:393-446,
dilate_scale=8: layer3 stride→1 dilation 2, layer4 stride→1 dilation 4;
stride-2 3×3 convs get dilation/padding dilate//2, stride-1 3×3 convs get
dilation/padding dilate; 1×1 downsample convs just lose their stride).

`__call__` returns the list of four stage feature maps
(reference base.py ResnetDilated.forward(return_feature_maps=True)), which
ResNetPL consumes (losses/perceptual.py:102-113).

Module names mirror torch keys (conv1, bn1, layer1_0, downsample_0, ...) so
encoder_epoch_20.pth converts mechanically via training/convert.py.
"""
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv import Conv2d, max_pool2d
from ...ops.norm import BatchNorm
from ...ops.pad import pad2d

Dtype = Any


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: Optional[int] = None  # dilation of the 3x3 conv
    has_downsample: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.first_dilation if self.first_dilation is not None else self.dilation
        residual = x
        out = Conv2d(self.planes, kernel_size=1, use_bias=False, name='conv1',
                     dtype=self.dtype)(x)
        out = BatchNorm(name='bn1')(out, use_running_average=not train)
        out = jax.nn.relu(out)
        out = Conv2d(self.planes, kernel_size=3, stride=self.stride, padding=d,
                     dilation=d, use_bias=False, name='conv2', dtype=self.dtype)(out)
        out = BatchNorm(name='bn2')(out, use_running_average=not train)
        out = jax.nn.relu(out)
        out = Conv2d(self.planes * 4, kernel_size=1, use_bias=False, name='conv3',
                     dtype=self.dtype)(out)
        out = BatchNorm(name='bn3')(out, use_running_average=not train)
        if self.has_downsample:
            residual = Conv2d(self.planes * 4, kernel_size=1, stride=self.stride,
                              use_bias=False, name='downsample_0', dtype=self.dtype)(x)
            residual = BatchNorm(name='downsample_1')(residual,
                                                      use_running_average=not train)
        return jax.nn.relu(out + residual)


class ResNetDilatedEncoder(nn.Module):
    """resnet50dilated, dilate_scale=8 (output stride 8); set `dilated=False`
    for the plain stride-32 resnet50 (the reference's arch_encoder='resnet50'
    ablation, perceptual.py ResNetPL arch_encoder kwarg)."""
    layers: Sequence[int] = (3, 4, 6, 3)
    dilated: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        # deep stem: 3x3 s2 -> 64, 3x3 -> 64, 3x3 -> 128
        h = Conv2d(64, kernel_size=3, stride=2, padding=1, use_bias=False,
                   name='conv1', dtype=self.dtype)(x)
        h = BatchNorm(name='bn1')(h, use_running_average=not train)
        h = jax.nn.relu(h)
        h = Conv2d(64, kernel_size=3, padding=1, use_bias=False, name='conv2',
                   dtype=self.dtype)(h)
        h = BatchNorm(name='bn2')(h, use_running_average=not train)
        h = jax.nn.relu(h)
        h = Conv2d(128, kernel_size=3, padding=1, use_bias=False, name='conv3',
                   dtype=self.dtype)(h)
        h = BatchNorm(name='bn3')(h, use_running_average=not train)
        h = jax.nn.relu(h)
        h = pad2d(h, 1, mode='zeros')
        h = max_pool2d(h, 3, 2)

        outs = []
        # (planes, blocks, stride, dilation, first_block_first_dilation)
        if self.dilated:
            stages = [
                (64, self.layers[0], 1, 1, None),
                (128, self.layers[1], 2, 1, None),
                (256, self.layers[2], 1, 2, 1),   # dilated: stride 2->1, first conv d=1
                (512, self.layers[3], 1, 4, 2),   # dilated: stride 2->1, first conv d=2
            ]
        else:
            stages = [
                (64, self.layers[0], 1, 1, None),
                (128, self.layers[1], 2, 1, None),
                (256, self.layers[2], 2, 1, None),
                (512, self.layers[3], 2, 1, None),
            ]
        in_planes = 128
        for stage_i, (planes, blocks, stride, dilation, first_d) in enumerate(stages, start=1):
            for block_i in range(blocks):
                is_first = block_i == 0
                h = Bottleneck(
                    planes,
                    stride=stride if is_first else 1,
                    dilation=dilation,
                    first_dilation=(first_d if is_first and first_d is not None else dilation),
                    has_downsample=is_first and (stride != 1 or in_planes != planes * 4),
                    name=f'layer{stage_i}_{block_i}', dtype=self.dtype)(h, train=train)
            in_planes = planes * 4
            outs.append(h)
        return outs
