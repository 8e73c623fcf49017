"""Resize ops matching torch F.interpolate semantics for NHWC tensors.

The reference uses: bilinear align_corners=False (trainers/default.py:50,
feature_matching.py:27, distance_weighting.py), nearest (default.py:51,
adversarial.py:68). torch 'nearest' uses floor(src = dst*scale) index
selection — jax.image 'nearest' rounds half-to-even, so we implement nearest
by hand with gather; bilinear half-pixel-centres matches jax.image 'linear'.
"""
from typing import Tuple

import jax
import jax.numpy as jnp


def _out_size(shape, size=None, scale_factor=None) -> Tuple[int, int]:
    if size is not None:
        if isinstance(size, int):
            return (size, size)
        return tuple(size)
    sf = scale_factor if isinstance(scale_factor, (tuple, list)) else (scale_factor, scale_factor)
    return (int(shape[1] * sf[0]), int(shape[2] * sf[1]))


def resize_nearest(x, size=None, scale_factor=None):
    """torch F.interpolate(mode='nearest') parity: src_idx = floor(dst * in/out)."""
    oh, ow = _out_size(x.shape, size, scale_factor)
    _, h, w, _ = x.shape
    rows = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    rows = jnp.clip(rows, 0, h - 1)
    cols = jnp.clip(cols, 0, w - 1)
    return x[:, rows][:, :, cols]


def resize_bilinear(x, size=None, scale_factor=None, align_corners=False):
    oh, ow = _out_size(x.shape, size, scale_factor)
    b, h, w, c = x.shape
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    if align_corners:
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
    else:
        # torch half-pixel centres WITHOUT anti-aliasing (jax.image.resize
        # anti-aliases downscales, torch F.interpolate does not)
        ys = jnp.clip((jnp.arange(oh) + 0.5) * (h / oh) - 0.5, 0.0, h - 1.0)
        xs = jnp.clip((jnp.arange(ow) + 0.5) * (w / ow) - 0.5, 0.0, w - 1.0)
    out = _sample_bilinear(x32, ys, xs)
    return out.astype(dtype)


def _sample_bilinear(x, ys, xs):
    h, w = x.shape[1], x.shape[2]
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def interpolate(x, size=None, scale_factor=None, mode='bilinear', align_corners=False):
    if mode == 'nearest':
        return resize_nearest(x, size, scale_factor)
    if mode == 'bilinear':
        return resize_bilinear(x, size, scale_factor, align_corners=align_corners)
    if mode == 'area':
        oh, ow = _out_size(x.shape, size, scale_factor)
        b, h, w, c = x.shape
        return jax.image.resize(x.astype(jnp.float32), (b, oh, ow, c), method='linear').astype(x.dtype) \
            if (oh > h or ow > w) else _area_downsample(x, oh, ow)
    raise ValueError(f'unsupported interpolate mode {mode}')


def _area_downsample(x, oh, ow):
    _, h, w, _ = x.shape
    assert h % oh == 0 and w % ow == 0, 'area resize supports integer factors'
    fh, fw = h // oh, w // ow
    from .conv import avg_pool2d
    return avg_pool2d(x, (fh, fw))
