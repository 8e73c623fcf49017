"""FID InceptionV3 — NHWC re-implementation of the pytorch-fid network
(reference saicinpainting/evaluation/losses/fid/inception.py:21-323).

The FID variant differs from torchvision InceptionV3: InceptionA/C pool
branches use average pooling with count_include_pad=False, InceptionE_1
likewise, and InceptionE_2 (Mixed_7c) uses a max-pool branch. BN eps=1e-3.
Input: [0,1] RGB, optionally resized to 299² (bilinear, align_corners=False)
and scaled to [-1,1]. Output blocks follow the pytorch-fid indexing
(0: maxpool1 64ch, 1: maxpool2 192ch, 2: pre-aux 768ch, 3: final pool 2048-d).

Module names mirror the torch attribute tree (Conv2d_1a_3x3.conv / .bn,
Mixed_5b.branch1x1...) so pt_inception-2015-12-05 weights convert via
training/convert.py when available; random init otherwise (flagged by caller).
"""
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv import Conv2d, avg_pool2d, max_pool2d
from ...ops.norm import BatchNorm
from ...ops.pad import pad2d
from ...ops.resize import resize_bilinear

Dtype = Any


def avg_pool_3x3_same_exclude_pad(x):
    """3×3 stride-1 'same' average pooling with count_include_pad=False."""
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), 'SAME')
    ones = jnp.ones_like(x[..., :1])
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), 'SAME')
    return summed / counts


def max_pool_3x3_same(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), 'SAME')


class BasicConv2d(nn.Module):
    features: int
    kernel_size: Any = 3
    stride: int = 1
    padding: Any = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, kernel_size=self.kernel_size, stride=self.stride,
                   padding=self.padding, use_bias=False, name='conv', dtype=self.dtype)(x)
        x = BatchNorm(epsilon=1e-3, name='bn')(x, use_running_average=not train)
        return jax.nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = dict(dtype=self.dtype)
        b1 = BasicConv2d(64, 1, name='branch1x1', **c)(x, train)
        b5 = BasicConv2d(48, 1, name='branch5x5_1', **c)(x, train)
        b5 = BasicConv2d(64, 5, padding=2, name='branch5x5_2', **c)(b5, train)
        b3 = BasicConv2d(64, 1, name='branch3x3dbl_1', **c)(x, train)
        b3 = BasicConv2d(96, 3, padding=1, name='branch3x3dbl_2', **c)(b3, train)
        b3 = BasicConv2d(96, 3, padding=1, name='branch3x3dbl_3', **c)(b3, train)
        bp = avg_pool_3x3_same_exclude_pad(x)
        bp = BasicConv2d(self.pool_features, 1, name='branch_pool', **c)(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = dict(dtype=self.dtype)
        b3 = BasicConv2d(384, 3, stride=2, name='branch3x3', **c)(x, train)
        bd = BasicConv2d(64, 1, name='branch3x3dbl_1', **c)(x, train)
        bd = BasicConv2d(96, 3, padding=1, name='branch3x3dbl_2', **c)(bd, train)
        bd = BasicConv2d(96, 3, stride=2, name='branch3x3dbl_3', **c)(bd, train)
        bp = max_pool2d(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c7 = self.channels_7x7
        c = dict(dtype=self.dtype)
        b1 = BasicConv2d(192, 1, name='branch1x1', **c)(x, train)
        b7 = BasicConv2d(c7, 1, name='branch7x7_1', **c)(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name='branch7x7_2', **c)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name='branch7x7_3', **c)(b7, train)
        bd = BasicConv2d(c7, 1, name='branch7x7dbl_1', **c)(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name='branch7x7dbl_2', **c)(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name='branch7x7dbl_3', **c)(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name='branch7x7dbl_4', **c)(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name='branch7x7dbl_5', **c)(bd, train)
        bp = avg_pool_3x3_same_exclude_pad(x)
        bp = BasicConv2d(192, 1, name='branch_pool', **c)(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = dict(dtype=self.dtype)
        b3 = BasicConv2d(192, 1, name='branch3x3_1', **c)(x, train)
        b3 = BasicConv2d(320, 3, stride=2, name='branch3x3_2', **c)(b3, train)
        b7 = BasicConv2d(192, 1, name='branch7x7x3_1', **c)(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name='branch7x7x3_2', **c)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name='branch7x7x3_3', **c)(b7, train)
        b7 = BasicConv2d(192, 3, stride=2, name='branch7x7x3_4', **c)(b7, train)
        bp = max_pool2d(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = 'avg'  # 'avg' (Mixed_7b) | 'max' (Mixed_7c, FID variant)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = dict(dtype=self.dtype)
        b1 = BasicConv2d(320, 1, name='branch1x1', **c)(x, train)
        b3 = BasicConv2d(384, 1, name='branch3x3_1', **c)(x, train)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name='branch3x3_2a', **c)(b3, train),
            BasicConv2d(384, (3, 1), padding=(1, 0), name='branch3x3_2b', **c)(b3, train),
        ], axis=-1)
        bd = BasicConv2d(448, 1, name='branch3x3dbl_1', **c)(x, train)
        bd = BasicConv2d(384, 3, padding=1, name='branch3x3dbl_2', **c)(bd, train)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name='branch3x3dbl_3a', **c)(bd, train),
            BasicConv2d(384, (3, 1), padding=(1, 0), name='branch3x3dbl_3b', **c)(bd, train),
        ], axis=-1)
        bp = avg_pool_3x3_same_exclude_pad(x) if self.pool_kind == 'avg' else max_pool_3x3_same(x)
        bp = BasicConv2d(192, 1, name='branch_pool', **c)(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Returns requested output blocks; block 3 is the 2048-d pooled feature
    used for FID."""
    output_blocks: Sequence[int] = (3,)
    resize_input: bool = True
    normalize_input: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.resize_input:
            x = resize_bilinear(x, size=(299, 299), align_corners=False)
        if self.normalize_input:
            x = 2 * x - 1
        c = dict(dtype=self.dtype)
        last = max(self.output_blocks)
        outs = []

        h = BasicConv2d(32, 3, stride=2, name='Conv2d_1a_3x3', **c)(x, train)
        h = BasicConv2d(32, 3, name='Conv2d_2a_3x3', **c)(h, train)
        h = BasicConv2d(64, 3, padding=1, name='Conv2d_2b_3x3', **c)(h, train)
        h = max_pool2d(h, 3, 2)
        if 0 in self.output_blocks:
            outs.append(h)
        if last == 0:
            return outs

        h = BasicConv2d(80, 1, name='Conv2d_3b_1x1', **c)(h, train)
        h = BasicConv2d(192, 3, name='Conv2d_4a_3x3', **c)(h, train)
        h = max_pool2d(h, 3, 2)
        if 1 in self.output_blocks:
            outs.append(h)
        if last == 1:
            return outs

        h = InceptionA(32, name='Mixed_5b', **c)(h, train)
        h = InceptionA(64, name='Mixed_5c', **c)(h, train)
        h = InceptionA(64, name='Mixed_5d', **c)(h, train)
        h = InceptionB(name='Mixed_6a', **c)(h, train)
        h = InceptionC(128, name='Mixed_6b', **c)(h, train)
        h = InceptionC(160, name='Mixed_6c', **c)(h, train)
        h = InceptionC(160, name='Mixed_6d', **c)(h, train)
        h = InceptionC(192, name='Mixed_6e', **c)(h, train)
        if 2 in self.output_blocks:
            outs.append(h)
        if last == 2:
            return outs

        h = InceptionD(name='Mixed_7a', **c)(h, train)
        h = InceptionE('avg', name='Mixed_7b', **c)(h, train)
        h = InceptionE('max', name='Mixed_7c', **c)(h, train)
        h = jnp.mean(h, axis=(1, 2), keepdims=True)  # adaptive avg pool (1,1)
        if 3 in self.output_blocks:
            outs.append(h)
        return outs
