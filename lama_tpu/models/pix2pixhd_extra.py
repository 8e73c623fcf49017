"""Experimental pix2pixHD generator variants (reference pix2pixhd.py:239-561,
667-669) — public API surface beyond the shipped configs: manual block specs,
supernet channel configurations, gated convolutions, and the
discriminator-as-generator adapter.
"""
import logging
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import get_activation
from ..ops.conv import Conv2d, ConvTranspose2d
from ..ops.norm import BatchNorm
from ..ops.pad import reflection_pad2d
from ..ops.serving_mode import DEFAULT as DEFAULT_MODE, ServingMode
from ..ops.resize import interpolate
from .pix2pixhd import (DepthWiseSeparableConv, MultidilatedResnetBlock,
                        NLayerDiscriminator, ResnetBlock)

LOGGER = logging.getLogger(__name__)
Dtype = Any


class GatedConv2d(nn.Module):
    """Gated convolution: features × sigmoid(gates). The reference registers
    GlobalGeneratorGated with conv_kind='gated_bn_relu' (pix2pixhd.py:439-447)
    but its conv registry never defines that kind — the torch class is dead
    code; this is a working equivalent."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = Conv2d(2 * self.features, kernel_size=self.kernel_size,
                   stride=self.stride, padding=self.padding, name='conv',
                   mode=self.mode, dtype=self.dtype)(x)
        feat, gate = jnp.split(h, 2, axis=-1)
        return feat * jax.nn.sigmoid(gate)


class ConfigGlobalGenerator(nn.Module):
    """Generator with manual per-segment block specs
    (reference pix2pixhd.py:239-331). Each entry of `manual_block_spec`:
    {'n_blocks', 'use_default', 'resnet_block_kind', 'resnet_conv_kind',
     'resnet_dilation', 'multidilation_kwargs'}."""
    input_nc: int = 4
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 3
    padding_type: str = 'reflect'
    conv_kind: str = 'default'
    deconv_kind: str = 'convtranspose'
    activation: Any = 'relu'
    up_activation: Any = 'relu'
    add_out_act: Any = True
    max_features: int = 1024
    manual_block_spec: Sequence[dict] = ()
    resnet_block_kind: str = 'multidilatedresnetblock'
    resnet_conv_kind: str = 'multidilated'
    resnet_dilation: int = 1
    multidilation_kwargs: Optional[dict] = None
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        up_act = get_activation(self.up_activation)

        x = reflection_pad2d(x, 3)
        x = Conv2d(self.ngf, kernel_size=7, padding=0, name='model_1',
                   mode=self.mode, dtype=self.dtype)(x)
        x = BatchNorm(name='model_2')(x, use_running_average=not train)
        x = act(x)
        idx = 4
        for i in range(self.n_downsampling):
            mult = 2 ** i
            x = Conv2d(min(self.max_features, self.ngf * mult * 2), kernel_size=3,
                       stride=2, padding=1, name=f'model_{idx}',
                       mode=self.mode, dtype=self.dtype)(x)
            x = BatchNorm(name=f'model_{idx + 1}')(x, use_running_average=not train)
            x = act(x)
            idx += 3

        mult = 2 ** self.n_downsampling
        feats = min(self.max_features, self.ngf * mult)
        specs = list(self.manual_block_spec) or [
            dict(n_blocks=self.n_blocks, use_default=True)]

        for spec in specs:
            spec = dict(spec)
            use_default = spec.get('use_default', False)
            block_kind = self.resnet_block_kind if use_default else \
                spec.get('resnet_block_kind', self.resnet_block_kind)
            conv_kind = self.resnet_conv_kind if use_default else \
                spec.get('resnet_conv_kind', self.resnet_conv_kind)
            dilation = self.resnet_dilation if use_default else \
                (spec.get('resnet_dilation') or self.resnet_dilation)
            md_kwargs = self.multidilation_kwargs if use_default else \
                spec.get('multidilation_kwargs', self.multidilation_kwargs)
            for _ in range(int(spec.get('n_blocks', 0))):
                if block_kind == 'multidilatedresnetblock':
                    x = MultidilatedResnetBlock(
                        feats, padding_type=self.padding_type,
                        activation=self.activation,
                        multidilation_kwargs=md_kwargs,
                        name=f'model_{idx}', mode=self.mode,
                        dtype=self.dtype)(x, train=train)
                elif block_kind == 'resnetblock':
                    x = ResnetBlock(self.ngf * mult, padding_type=self.padding_type,
                                    activation=self.activation, conv_kind=conv_kind,
                                    name=f'model_{idx}', mode=self.mode,
                                    dtype=self.dtype)(x, train=train)
                elif block_kind == 'resnetblock5x5':
                    x = ResnetBlock(self.ngf * mult, padding_type=self.padding_type,
                                    activation=self.activation, conv_kind=conv_kind,
                                    kernel_size=5, name=f'model_{idx}',
                                    mode=self.mode, dtype=self.dtype)(x, train=train)
                elif block_kind == 'resnetblockdwdil':
                    x = ResnetBlock(self.ngf * mult, padding_type=self.padding_type,
                                    activation=self.activation, conv_kind=conv_kind,
                                    dilation=dilation, second_dilation=dilation,
                                    name=f'model_{idx}', mode=self.mode,
                                    dtype=self.dtype)(x, train=train)
                else:
                    raise ValueError(f'Unknown resnet block kind {block_kind}')
                idx += 1

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            out_ch = min(self.max_features, int(self.ngf * mult / 2))
            if self.deconv_kind == 'convtranspose':
                x = ConvTranspose2d(out_ch, kernel_size=3, stride=2, padding=1,
                                    output_padding=1, name=f'model_{idx}',
                                    mode=self.mode, dtype=self.dtype)(x)
                x = BatchNorm(name=f'model_{idx + 1}')(x, use_running_average=not train)
                x = up_act(x)
                idx += 3
            elif self.deconv_kind == 'bilinear':
                # deconv_factory 'bilinear': upsample + depthwise-sep conv
                # (reference modules/base.py:73-79)
                x = interpolate(x, scale_factor=2, mode='bilinear')
                idx += 1
                x = DepthWiseSeparableConv(out_ch, kernel_size=3, stride=1,
                                           padding=1, name=f'model_{idx}',
                                           mode=self.mode, dtype=self.dtype)(x)
                x = BatchNorm(name=f'model_{idx + 1}')(x, use_running_average=not train)
                x = up_act(x)
                idx += 3
            else:
                raise ValueError(f'Invalid deconv kind: {self.deconv_kind}')

        x = reflection_pad2d(x, 3)
        idx += 1
        x = Conv2d(self.output_nc, kernel_size=7, padding=0, name=f'model_{idx}',
                   mode=self.mode, dtype=self.dtype)(x)
        if self.add_out_act:
            out_act = get_activation('tanh' if self.add_out_act is True else self.add_out_act)
            x = out_act(x.astype(jnp.float32))
        return x


def convert_super_channels(super_channels, n_downsampling):
    """reference pix2pixhd.py:517-558: supernet channel schedule expansion."""
    result = []
    cnt = 0
    if n_downsampling == 2:
        n1 = 10
    elif n_downsampling == 3:
        n1 = 13
    else:
        raise NotImplementedError
    for i in range(0, n1):
        if i in (1, 4, 7, 10):
            result.append(super_channels[cnt] * (2 ** cnt))
            cnt += 1
    for i in range(3):
        for counter, _ in enumerate(range(n1 + i * 3, n1 + 3 + i * 3)):
            channel = super_channels[3] * 4 if len(super_channels) == 6 \
                else super_channels[i + 3] * 4
            if counter == 0:
                result.append(channel)
    cnt = 2
    for i in range(n1 + 9, n1 + 21):
        if i in (22, 25, 28):
            cnt -= 1
            # note: the reference indexes super_channels[5-cnt] which walks out
            # of range on the third upsample layer (latent IndexError in the
            # experimental torch code); we clamp to the last entry instead
            base = 5 if len(super_channels) == 6 else 7
            idx = min(base - cnt, len(super_channels) - 1)
            result.append(int(super_channels[idx] * (2 ** max(cnt, 0))))
    return result


class GlobalGeneratorFromSuperChannels(nn.Module):
    """reference pix2pixhd.py:449-561: generator with a supernet-derived
    per-stage channel schedule and input-projected resnet segments."""
    input_nc: int = 4
    output_nc: int = 3
    n_downsampling: int = 3
    n_blocks: int = 9
    super_channels: Sequence[int] = (64, 64, 64, 64, 64, 64)
    padding_type: str = 'reflect'
    add_out_act: Any = True
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = convert_super_channels(list(self.super_channels),
                                          self.n_downsampling)
        nd = self.n_downsampling

        x = reflection_pad2d(x, 3)
        x = Conv2d(channels[0], kernel_size=7, padding=0, name='model_1',
                   mode=self.mode, dtype=self.dtype)(x)
        x = BatchNorm(name='model_2')(x, use_running_average=not train)
        x = jax.nn.relu(x)
        idx = 4
        for i in range(nd):
            x = Conv2d(channels[1 + i], kernel_size=3, stride=2, padding=1,
                       name=f'model_{idx}', mode=self.mode, dtype=self.dtype)(x)
            x = BatchNorm(name=f'model_{idx + 1}')(x, use_running_average=not train)
            x = jax.nn.relu(x)
            idx += 3

        n1 = self.n_blocks // 3
        n2 = n1
        n3 = self.n_blocks - n1 - n2
        segments = [(n1, channels[nd], None),
                    (n2, channels[nd + 1], channels[nd]),
                    (n3, channels[nd + 2], channels[nd + 1])]
        for seg_i, (n_blocks, dim, in_dim) in enumerate(segments):
            for block_i in range(n_blocks):
                x = ResnetBlock(dim, padding_type=self.padding_type,
                                in_dim=in_dim if block_i == 0 else None,
                                name=f'model_{idx}', mode=self.mode,
                                dtype=self.dtype)(x, train=train)
                idx += 1

        for i in range(nd):
            x = ConvTranspose2d(channels[nd + 3 + i + 1], kernel_size=3, stride=2,
                                padding=1, output_padding=1, name=f'model_{idx}',
                                mode=self.mode, dtype=self.dtype)(x)
            x = BatchNorm(name=f'model_{idx + 1}')(x, use_running_average=not train)
            x = jax.nn.relu(x)
            idx += 3

        x = reflection_pad2d(x, 3)
        idx += 1
        x = Conv2d(self.output_nc, kernel_size=7, padding=0, name=f'model_{idx}',
                   mode=self.mode, dtype=self.dtype)(x)
        if self.add_out_act:
            out_act = get_activation('tanh' if self.add_out_act is True else self.add_out_act)
            x = out_act(x.astype(jnp.float32))
        return x


class NLayerDiscriminatorAsGen(nn.Module):
    """Discriminator body used as a generator: forward returns only the score
    map (reference pix2pixhd.py:667-669)."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    mode: ServingMode = DEFAULT_MODE  # accepted for factory uniformity; the
    # discriminator body serves unquantized (thin 4x4 patch convs)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        score, _ = NLayerDiscriminator(self.input_nc, self.ndf, self.n_layers,
                                       name='impl', dtype=self.dtype)(x, train=train)
        return score


class SimpleMultiStepGenerator(nn.Module):
    """Runs `steps` sequentially, feeding [input, prev outputs] concatenated
    and returning the reversed concat of outputs (reference base.py:53-65)."""
    steps: Sequence[nn.Module]

    def __call__(self, x, train: bool = False):
        cur_in = x
        outs = []
        for step in self.steps:
            cur_out = step(cur_in, train=train)
            outs.append(cur_out)
            cur_in = jnp.concatenate([cur_in, cur_out], axis=-1)
        return jnp.concatenate(outs[::-1], axis=-1)
