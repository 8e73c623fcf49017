"""pix2pixHD model family — TPU-native NHWC re-implementation.

Covers the reference saicinpainting/training/modules/pix2pixhd.py surface that
the shipped configs use plus the public extras:
- `NLayerDiscriminator` — THE default LaMa discriminator (reference
  pix2pixhd.py:565-613; config discriminator/pix2pixhd_nlayer.yaml: ndf=64,
  n_layers=4): 4×4 convs, stride 2, LeakyReLU(0.2), BN; returns
  (score map, per-stage features) for feature matching.
- `GlobalGenerator` (pix2pixhd.py:341-436) — lama-regular / big-lama-regular
  baselines, with dilated-block and depthwise options.
- `MultiDilatedGlobalGenerator` (pix2pixhd.py:178-237) and
  `MultidilatedNLayerDiscriminator` (pix2pixhd.py:616-664).
- `MultidilatedConv` (multidilated_conv.py:6-98), `DepthWiseSeparableConv`
  (depthwise_sep_conv.py:4-17), `ResnetBlock` / `ResnetBlock5x5` /
  `MultidilatedResnetBlock` (pix2pixhd.py:30-175).

Sequential members are named model_<i> (generators) / model<n>_<i>
(discriminator stages) to make torch→pytree checkpoint conversion mechanical.
"""
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.activations import get_activation
from ..ops.conv import Conv2d, ConvTranspose2d
from ..ops.norm import BatchNorm
from ..ops.pad import pad2d, reflection_pad2d
from ..ops.serving_mode import DEFAULT as DEFAULT_MODE, ServingMode
from .ffc import FFCResnetBlock

Dtype = Any


class DepthWiseSeparableConv(nn.Module):
    """depthwise conv + 1×1 pointwise (reference depthwise_sep_conv.py)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    padding_mode: str = 'zeros'
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        x = Conv2d(in_dim, kernel_size=self.kernel_size, stride=self.stride,
                   padding=self.padding, dilation=self.dilation, groups=in_dim,
                   padding_mode=self.padding_mode, name='depthwise',
                   mode=self.mode, dtype=self.dtype)(x)
        x = Conv2d(self.features, kernel_size=1, name='pointwise',
                   mode=self.mode, dtype=self.dtype)(x)
        return x


class MultidilatedConv(nn.Module):
    """Parallel convs at dilations min_dilation*2^i combined by sum or
    interleaved concat (reference multidilated_conv.py:6-98)."""
    features: int
    kernel_size: int = 3
    dilation_num: int = 3
    comb_mode: str = 'sum'
    equal_dim: bool = True
    padding: Any = 1
    min_dilation: int = 1
    stride: int = 1
    use_depthwise: bool = False
    padding_mode: str = 'zeros'
    shuffle_in_channels: bool = False
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        assert self.comb_mode in ('cat_out', 'sum', 'cat_in', 'cat_both'), self.comb_mode
        in_dim = x.shape[-1]
        out_dim = self.features
        cat_out = self.comb_mode in ('cat_out', 'cat_both')
        cat_in = self.comb_mode in ('cat_in', 'cat_both')

        if cat_out:
            if self.equal_dim:
                assert out_dim % self.dilation_num == 0
                out_dims = [out_dim // self.dilation_num] * self.dilation_num
                index = sum([[i + j * out_dims[0] for j in range(self.dilation_num)]
                             for i in range(out_dims[0])], [])
            else:
                out_dims = [out_dim // 2 ** (i + 1) for i in range(self.dilation_num - 1)]
                out_dims.append(out_dim - sum(out_dims))
                index = []
                starts = [0] + out_dims[:-1]
                lengths = [out_dims[i] // out_dims[-1] for i in range(self.dilation_num)]
                for i in range(out_dims[-1]):
                    for j in range(self.dilation_num):
                        index += list(range(starts[j], starts[j] + lengths[j]))
                        starts[j] += lengths[j]
        else:
            out_dims = [out_dim] * self.dilation_num
            index = None

        if cat_in:
            if self.equal_dim:
                assert in_dim % self.dilation_num == 0
                in_dims = [in_dim // self.dilation_num] * self.dilation_num
            else:
                in_dims = [in_dim // 2 ** (i + 1) for i in range(self.dilation_num - 1)]
                in_dims.append(in_dim - sum(in_dims))
        else:
            in_dims = [in_dim] * self.dilation_num

        if self.shuffle_in_channels:
            perm = self.variable(
                'constants', 'in_channels_permute',
                lambda: jnp.asarray(np.random.RandomState(0).permutation(in_dim)))
            x = x[..., perm.value]

        conv_cls = DepthWiseSeparableConv if self.use_depthwise else Conv2d
        inputs = jnp.split(x, np.cumsum(in_dims)[:-1], axis=-1) if cat_in else [x] * self.dilation_num

        outs = []
        dilation = self.min_dilation
        for i in range(self.dilation_num):
            cur_padding = self.padding * dilation if isinstance(self.padding, int) else self.padding[i]
            outs.append(conv_cls(out_dims[i], kernel_size=self.kernel_size,
                                 stride=self.stride, padding=cur_padding,
                                 dilation=dilation, padding_mode=self.padding_mode,
                                 name=f'convs_{i}', mode=self.mode,
                                 dtype=self.dtype)(inputs[i]))
            dilation *= 2

        if cat_out:
            out = jnp.concatenate(outs, axis=-1)[..., jnp.asarray(index)]
        else:
            out = sum(outs)
        return out


class ResnetBlock(nn.Module):
    """conv residual block (reference pix2pixhd.py:30-92); conv_kind
    'default'|'depthwise'; reflect/replicate/zero padding."""
    dim: int
    padding_type: str = 'reflect'
    activation: Any = 'relu'
    conv_kind: str = 'default'
    dilation: int = 1
    second_dilation: Optional[int] = None
    in_dim: Optional[int] = None
    groups: int = 1
    kernel_size: int = 3
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        second_dilation = self.second_dilation if self.second_dilation is not None else self.dilation
        pad_mult = 2 if self.kernel_size == 5 else 1

        pad_mode = {'reflect': 'reflect', 'replicate': 'replicate'}.get(
            self.padding_type, 'zeros')

        def conv_padded(features, dilation, groups, name, t):
            p = dilation * pad_mult
            if self.conv_kind == 'depthwise':
                return DepthWiseSeparableConv(features, kernel_size=self.kernel_size,
                                              padding=p, dilation=dilation,
                                              padding_mode=pad_mode, name=name,
                                              mode=self.mode, dtype=self.dtype)(t)
            return Conv2d(features, kernel_size=self.kernel_size, padding=p,
                          dilation=dilation, groups=groups, padding_mode=pad_mode,
                          name=name, mode=self.mode, dtype=self.dtype)(t)

        x_before = x
        h = conv_padded(self.dim, self.dilation, 1, 'conv_block_1', x_before)
        h = BatchNorm(name='conv_block_2', axis_name=self.bn_axis_name)(h, use_running_average=not train)
        h = act(h)
        h = conv_padded(self.dim, second_dilation, self.groups, 'conv_block_5', h)
        h = BatchNorm(name='conv_block_6', axis_name=self.bn_axis_name)(h, use_running_average=not train)

        if self.in_dim is not None:
            x = Conv2d(self.dim, kernel_size=1, name='input_conv',
                       mode=self.mode, dtype=self.dtype)(x)
        return x + h


class MultidilatedResnetBlock(nn.Module):
    """reference pix2pixhd.py:156-175."""
    dim: int
    padding_type: str = 'reflect'
    activation: Any = 'relu'
    multidilation_kwargs: Optional[dict] = None
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        md_kwargs = dict(self.multidilation_kwargs or {})
        h = MultidilatedConv(self.dim, kernel_size=3, padding_mode=self.padding_type,
                             name='conv_block_0', mode=self.mode,
                             dtype=self.dtype, **md_kwargs)(x)
        h = BatchNorm(name='conv_block_1', axis_name=self.bn_axis_name)(h, use_running_average=not train)
        h = act(h)
        h = MultidilatedConv(self.dim, kernel_size=3, padding_mode=self.padding_type,
                             name='conv_block_3', mode=self.mode,
                             dtype=self.dtype, **md_kwargs)(h)
        h = BatchNorm(name='conv_block_4', axis_name=self.bn_axis_name)(h, use_running_average=not train)
        return x + h


class GlobalGenerator(nn.Module):
    """pix2pixHD conv-ResNet generator (reference pix2pixhd.py:341-436),
    `kind='pix2pixhd_global'` — the lama-regular baseline."""
    input_nc: int = 4
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    padding_type: str = 'reflect'
    conv_kind: str = 'default'
    activation: Any = 'relu'
    up_activation: Any = 'relu'
    dilated_blocks_n: int = 0
    dilated_blocks_n_start: int = 0
    dilated_blocks_n_middle: int = 0
    add_out_act: Any = True
    max_features: int = 1024
    is_resblock_depthwise: bool = False
    ffc_positions: Optional[Sequence[int]] = None
    ffc_kwargs: Optional[dict] = None
    dilation: int = 1
    second_dilation: Optional[int] = None
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NHWC derives channel counts from the input; check input_nc anyway so
        # a misconfigured kind fails loudly like the torch reference would
        assert x.shape[-1] == self.input_nc, (x.shape, self.input_nc)
        act = get_activation(self.activation)
        up_act = get_activation(self.up_activation)
        common = dict(mode=self.mode, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name)

        # indices: 0 pad, 1 conv, 2 bn, 3 act
        x = Conv2d(self.ngf, kernel_size=7, padding=3, padding_mode='reflect',
                   name='model_1', mode=self.mode, dtype=self.dtype)(x)
        x = BatchNorm(name='model_2', axis_name=self.bn_axis_name)(x, use_running_average=not train)
        x = act(x)
        idx = 4

        for i in range(self.n_downsampling):
            mult = 2 ** i
            x = Conv2d(min(self.max_features, self.ngf * mult * 2), kernel_size=3,
                       stride=2, padding=1, name=f'model_{idx}',
                       mode=self.mode, dtype=self.dtype)(x)
            x = BatchNorm(name=f'model_{idx + 1}',
                          axis_name=self.bn_axis_name)(x, use_running_average=not train)
            x = act(x)
            idx += 3

        mult = 2 ** self.n_downsampling
        feats = min(self.max_features, self.ngf * mult)

        def dil_blocks(n, base_idx):
            nonlocal x
            for j in range(n):
                x = ResnetBlock(feats, padding_type=self.padding_type,
                                activation=self.activation, conv_kind=self.conv_kind,
                                dilation=2 ** (j + 1), name=f'model_{base_idx + j}',
                                **common)(x, train=train)
            return base_idx + n

        if self.dilated_blocks_n_start:
            idx = dil_blocks(self.dilated_blocks_n_start, idx)

        ffc_positions = list(self.ffc_positions or [])
        for i in range(self.n_blocks):
            if i == self.n_blocks // 2 and self.dilated_blocks_n_middle:
                idx = dil_blocks(self.dilated_blocks_n_middle, idx)
            if i in ffc_positions:
                for _ in range(ffc_positions.count(i)):
                    kw = dict(self.ffc_kwargs or {})
                    x = FFCResnetBlock(feats, padding_type=self.padding_type,
                                       activation='relu', inline=True,
                                       ratio_gin=kw.get('ratio_gin', 0.75),
                                       ratio_gout=kw.get('ratio_gout', 0.75),
                                       enable_lfu=kw.get('enable_lfu', True),
                                       name=f'model_{idx}', **common)(x, train=train)
                    idx += 1
            x = ResnetBlock(feats, padding_type=self.padding_type,
                            activation=self.activation, conv_kind=self.conv_kind,
                            groups=feats if self.is_resblock_depthwise else 1,
                            dilation=self.dilation, second_dilation=self.second_dilation,
                            name=f'model_{idx}', **common)(x, train=train)
            idx += 1

        if self.dilated_blocks_n:
            idx = dil_blocks(self.dilated_blocks_n, idx)

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x = ConvTranspose2d(min(self.max_features, int(self.ngf * mult / 2)),
                                kernel_size=3, stride=2, padding=1, output_padding=1,
                                name=f'model_{idx}', mode=self.mode,
                                dtype=self.dtype)(x)
            x = BatchNorm(name=f'model_{idx + 1}',
                          axis_name=self.bn_axis_name)(x, use_running_average=not train)
            x = up_act(x)
            idx += 3

        idx += 1
        x = Conv2d(self.output_nc, kernel_size=7, padding=3, padding_mode='reflect',
                   name=f'model_{idx}', mode=self.mode, dtype=self.dtype)(x)
        if self.add_out_act:
            out_act = get_activation('tanh' if self.add_out_act is True else self.add_out_act)
            x = out_act(x.astype(jnp.float32))
        return x


class MultiDilatedGlobalGenerator(nn.Module):
    """reference pix2pixhd.py:178-237, `kind='pix2pixhd_multidilated'`."""
    input_nc: int = 4
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 3
    padding_type: str = 'reflect'
    activation: Any = 'relu'
    up_activation: Any = 'relu'
    add_out_act: Any = True
    max_features: int = 1024
    multidilation_kwargs: Optional[dict] = None
    ffc_positions: Optional[Sequence[int]] = None
    ffc_kwargs: Optional[dict] = None
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        up_act = get_activation(self.up_activation)
        common = dict(mode=self.mode, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name)

        x = Conv2d(self.ngf, kernel_size=7, padding=3, padding_mode='reflect',
                   name='model_1', mode=self.mode, dtype=self.dtype)(x)
        x = BatchNorm(name='model_2', axis_name=self.bn_axis_name)(x, use_running_average=not train)
        x = act(x)
        idx = 4

        for i in range(self.n_downsampling):
            mult = 2 ** i
            x = Conv2d(min(self.max_features, self.ngf * mult * 2), kernel_size=3,
                       stride=2, padding=1, name=f'model_{idx}',
                       mode=self.mode, dtype=self.dtype)(x)
            x = BatchNorm(name=f'model_{idx + 1}',
                          axis_name=self.bn_axis_name)(x, use_running_average=not train)
            x = act(x)
            idx += 3

        mult = 2 ** self.n_downsampling
        feats = min(self.max_features, self.ngf * mult)
        ffc_positions = list(self.ffc_positions or [])
        for i in range(self.n_blocks):
            if i in ffc_positions:
                kw = dict(self.ffc_kwargs or {})
                x = FFCResnetBlock(feats, padding_type=self.padding_type,
                                   activation='relu', inline=True,
                                   ratio_gin=kw.get('ratio_gin', 0.75),
                                   ratio_gout=kw.get('ratio_gout', 0.75),
                                   enable_lfu=kw.get('enable_lfu', True),
                                   name=f'model_{idx}', **common)(x, train=train)
                idx += 1
            x = MultidilatedResnetBlock(feats, padding_type=self.padding_type,
                                        activation=self.activation,
                                        multidilation_kwargs=self.multidilation_kwargs,
                                        name=f'model_{idx}', **common)(x, train=train)
            idx += 1

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x = ConvTranspose2d(min(self.max_features, int(self.ngf * mult / 2)),
                                kernel_size=3, stride=2, padding=1, output_padding=1,
                                name=f'model_{idx}', mode=self.mode,
                                dtype=self.dtype)(x)
            x = BatchNorm(name=f'model_{idx + 1}',
                          axis_name=self.bn_axis_name)(x, use_running_average=not train)
            x = up_act(x)
            idx += 3

        idx += 1
        x = Conv2d(self.output_nc, kernel_size=7, padding=3, padding_mode='reflect',
                   name=f'model_{idx}', mode=self.mode, dtype=self.dtype)(x)
        if self.add_out_act:
            out_act = get_activation('tanh' if self.add_out_act is True else self.add_out_act)
            x = out_act(x.astype(jnp.float32))
        return x


class NLayerDiscriminator(nn.Module):
    """pix2pixHD PatchGAN — the default LaMa discriminator (reference
    pix2pixhd.py:565-613). Returns (score, [stage activations]); features are
    the outputs of stages 0..n_layers (post-activation), used by
    feature_matching_loss (trainers/default.py:128)."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.input_nc, (x.shape, self.input_nc)
        kw, padw = 4, 2
        feats = []
        leaky = get_activation('leaky_relu')

        h = Conv2d(self.ndf, kernel_size=kw, stride=2, padding=padw,
                   name='model0_0', dtype=self.dtype)(x)
        h = leaky(h)
        feats.append(h)

        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = Conv2d(nf, kernel_size=kw, stride=2, padding=padw,
                       name=f'model{n}_0', dtype=self.dtype)(h)
            h = BatchNorm(name=f'model{n}_1',
                          axis_name=self.bn_axis_name)(h, use_running_average=not train)
            h = leaky(h)
            feats.append(h)

        nf = min(nf * 2, 512)
        h = Conv2d(nf, kernel_size=kw, stride=1, padding=padw,
                   name=f'model{self.n_layers}_0', dtype=self.dtype)(h)
        h = BatchNorm(name=f'model{self.n_layers}_1',
                      axis_name=self.bn_axis_name)(h, use_running_average=not train)
        h = leaky(h)
        feats.append(h)

        score = Conv2d(1, kernel_size=kw, stride=1, padding=padw,
                       name=f'model{self.n_layers + 1}_0', dtype=self.dtype)(h)
        return score, feats


class MultidilatedNLayerDiscriminator(nn.Module):
    """reference pix2pixhd.py:616-664."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    multidilation_kwargs: Optional[dict] = None
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.input_nc, (x.shape, self.input_nc)
        kw, padw = 4, 2
        feats = []
        leaky = get_activation('leaky_relu')
        md_kwargs = dict(self.multidilation_kwargs or {})

        h = Conv2d(self.ndf, kernel_size=kw, stride=2, padding=padw,
                   name='model0_0', dtype=self.dtype)(x)
        h = leaky(h)
        feats.append(h)

        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = MultidilatedConv(nf, kernel_size=kw, stride=2, padding=[2, 3],
                                 name=f'model{n}_0', dtype=self.dtype, **md_kwargs)(h)
            h = BatchNorm(name=f'model{n}_1',
                          axis_name=self.bn_axis_name)(h, use_running_average=not train)
            h = leaky(h)
            feats.append(h)

        nf = min(nf * 2, 512)
        h = Conv2d(nf, kernel_size=kw, stride=1, padding=padw,
                   name=f'model{self.n_layers}_0', dtype=self.dtype)(h)
        h = BatchNorm(name=f'model{self.n_layers}_1',
                      axis_name=self.bn_axis_name)(h, use_running_average=not train)
        h = leaky(h)
        feats.append(h)

        score = Conv2d(1, kernel_size=kw, stride=1, padding=padw,
                       name=f'model{self.n_layers + 1}_0', dtype=self.dtype)(h)
        return score, feats
