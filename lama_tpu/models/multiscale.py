"""Multiscale coarse→fine generator/discriminator family (reference
training/modules/multiscale.py:11-244) — not wired into shipped configs but
part of the public module surface. NHWC flax.

`MultiscaleResNet`: per-scale ResNetHead encoders, ResNetTail decoders with
feature hand-off from coarser to finer scales (finer tails receive
[features, upsampled coarser tail features] through a 1×1 input projection).
"""
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import get_activation
from ..ops.conv import Conv2d, ConvTranspose2d
from ..ops.norm import BatchNorm
from ..ops.pad import reflection_pad2d
from ..ops.resize import interpolate
from .pix2pixhd import ResnetBlock

Dtype = Any


class ResNetHead(nn.Module):
    """reference multiscale.py:11-41."""
    input_nc: int = 4
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    padding_type: str = 'reflect'
    conv_kind: str = 'default'
    activation: Any = 'relu'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        x = reflection_pad2d(x, 3)
        x = Conv2d(self.ngf, kernel_size=7, padding=0, name='model_1', dtype=self.dtype)(x)
        x = BatchNorm(name='model_2')(x, use_running_average=not train)
        x = act(x)
        idx = 4
        for i in range(self.n_downsampling):
            mult = 2 ** i
            x = Conv2d(self.ngf * mult * 2, kernel_size=3, stride=2, padding=1,
                       name=f'model_{idx}', dtype=self.dtype)(x)
            x = BatchNorm(name=f'model_{idx + 1}')(x, use_running_average=not train)
            x = act(x)
            idx += 3
        mult = 2 ** self.n_downsampling
        for i in range(self.n_blocks):
            x = ResnetBlock(self.ngf * mult, padding_type=self.padding_type,
                            activation=self.activation, conv_kind=self.conv_kind,
                            name=f'model_{idx}', dtype=self.dtype)(x, train=train)
            idx += 1
        return x


class ResNetTail(nn.Module):
    """reference multiscale.py:44-91."""
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    padding_type: str = 'reflect'
    conv_kind: str = 'default'
    activation: Any = 'relu'
    up_activation: Any = 'relu'
    add_out_act: Any = False
    out_extra_layers_n: int = 0
    add_in_proj: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_last_act: bool = False):
        act = get_activation(self.activation)
        up_act = get_activation(self.up_activation)
        mult = 2 ** self.n_downsampling
        idx = 0
        if self.add_in_proj is not None:
            x = Conv2d(self.ngf * mult, kernel_size=1, name=f'model_{idx}',
                       dtype=self.dtype)(x)
            idx += 1
        for i in range(self.n_blocks):
            x = ResnetBlock(self.ngf * mult, padding_type=self.padding_type,
                            activation=self.activation, conv_kind=self.conv_kind,
                            name=f'model_{idx}', dtype=self.dtype)(x, train=train)
            idx += 1
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x = ConvTranspose2d(int(self.ngf * mult / 2), kernel_size=3, stride=2,
                                padding=1, output_padding=1, name=f'model_{idx}',
                                dtype=self.dtype)(x)
            x = BatchNorm(name=f'model_{idx + 1}')(x, use_running_average=not train)
            x = up_act(x)
            idx += 3
        features = x

        oidx = 0
        for _ in range(self.out_extra_layers_n):
            x = Conv2d(self.ngf, kernel_size=1, padding=0, name=f'out_proj_{oidx}',
                       dtype=self.dtype)(x)
            x = BatchNorm(name=f'out_proj_{oidx + 1}')(x, use_running_average=not train)
            x = up_act(x)
            oidx += 3
        x = reflection_pad2d(x, 3)
        oidx += 1
        x = Conv2d(self.output_nc, kernel_size=7, padding=0, name=f'out_proj_{oidx}',
                   dtype=self.dtype)(x)
        if self.add_out_act:
            out_act = get_activation('tanh' if self.add_out_act is True else self.add_out_act)
            x = out_act(x.astype(jnp.float32))
        if return_last_act:
            return x, features
        return x


class MultiscaleResNet(nn.Module):
    """reference multiscale.py:94-171. `__call__(ms_inputs)`: list of inputs
    HR→LR; returns list of outputs HR→LR (or only HR)."""
    input_nc: int = 4
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 2
    n_blocks_head: int = 2
    n_blocks_tail: int = 6
    n_scales: int = 3
    padding_type: str = 'reflect'
    conv_kind: str = 'default'
    activation: Any = 'relu'
    up_activation: Any = 'relu'
    add_out_act: Any = False
    out_extra_layers_n: int = 0
    out_cumulative: bool = False
    return_only_hr: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, ms_inputs: List, train: bool = False,
                 smallest_scales_num: Optional[int] = None):
        heads = [ResNetHead(self.input_nc, ngf=self.ngf,
                            n_downsampling=self.n_downsampling,
                            n_blocks=self.n_blocks_head,
                            padding_type=self.padding_type,
                            conv_kind=self.conv_kind, activation=self.activation,
                            name=f'heads_{i}', dtype=self.dtype)
                 for i in range(self.n_scales)]
        tail_in_feats = self.ngf * (2 ** self.n_downsampling) + self.ngf
        tails = [ResNetTail(self.output_nc, ngf=self.ngf,
                            n_downsampling=self.n_downsampling,
                            n_blocks=self.n_blocks_tail,
                            padding_type=self.padding_type,
                            conv_kind=self.conv_kind, activation=self.activation,
                            up_activation=self.up_activation,
                            add_out_act=self.add_out_act,
                            out_extra_layers_n=self.out_extra_layers_n,
                            add_in_proj=None if i == self.n_scales - 1 else tail_in_feats,
                            name=f'tails_{i}', dtype=self.dtype)
                 for i in range(self.n_scales)]

        if smallest_scales_num is None:
            assert len(heads) == len(ms_inputs)
            smallest_scales_num = len(heads)
        else:
            assert smallest_scales_num == len(ms_inputs) <= len(heads)

        cur_heads = heads[-smallest_scales_num:]
        ms_features = [head(inp, train=train) for head, inp in zip(cur_heads, ms_inputs)]

        all_outputs = []
        prev_tail_features = None
        for i in range(len(ms_features)):
            scale_i = -i - 1
            cur_tail_input = ms_features[-i - 1]
            if prev_tail_features is not None:
                if prev_tail_features.shape[1:3] != cur_tail_input.shape[1:3]:
                    prev_tail_features = interpolate(
                        prev_tail_features, size=cur_tail_input.shape[1:3],
                        mode='bilinear', align_corners=False)
                cur_tail_input = jnp.concatenate([cur_tail_input, prev_tail_features],
                                                 axis=-1)
            cur_out, cur_tail_feats = tails[scale_i](cur_tail_input, train=train,
                                                     return_last_act=True)
            prev_tail_features = cur_tail_feats
            all_outputs.append(cur_out)

        if self.out_cumulative:
            cum = [all_outputs[0]]
            for i in range(1, len(ms_features)):
                cur = all_outputs[i] + interpolate(cum[-1], size=all_outputs[i].shape[1:3],
                                                   mode='bilinear', align_corners=False)
                cum.append(cur)
            all_outputs = cum

        if self.return_only_hr:
            return all_outputs[-1]
        return all_outputs[::-1]


class MultiscaleDiscriminatorSimple(nn.Module):
    """Wraps per-scale discriminators (reference multiscale.py:174-196).
    `discriminators` is a list of flax modules returning (score, feats)."""
    discriminators: Sequence[nn.Module]

    def __call__(self, ms_inputs: List, train: bool = False,
                 smallest_scales_num: Optional[int] = None):
        impls = list(self.discriminators)
        if smallest_scales_num is None:
            assert len(impls) == len(ms_inputs)
            smallest_scales_num = len(impls)
        else:
            assert smallest_scales_num == len(ms_inputs) <= len(impls)
        return [d(inp, train=train)
                for d, inp in zip(impls[-smallest_scales_num:], ms_inputs)]


def make_multiscale_inputs(x, num_scales: int) -> List:
    """Single tensor -> list of bilinear-downscaled inputs HR->LR
    (reference SingleToMultiScaleInputMixin, multiscale.py:199-205)."""
    h, w = x.shape[1:3]
    return [interpolate(x, size=(h // (2 ** i), w // (2 ** i)), mode='bilinear',
                        align_corners=False) for i in range(num_scales)]
