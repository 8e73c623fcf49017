"""Geometric warps (rotation / affine) via bilinear grid sampling, NHWC.

Replaces the reference's kornia dependency (spatial_transform.py:4,
fake_fakes.py:2-3, refinement.py:4-6). Convention matches kornia.rotate:
rotation around the image centre, bilinear sampling, zero padding outside.
"""
import jax.numpy as jnp


def _reflect_index(i, n):
    """Reflect out-of-range indices into [0, n-1] (border-reflect sampling)."""
    period = jnp.maximum(2 * n - 2, 1)
    i = jnp.abs(i)
    i = i % period
    return jnp.where(i >= n, period - i, i)


def _grid_sample_bilinear(x, ys, xs, padding_mode='zeros'):
    """Sample NHWC `x` at float coords (ys, xs) of shape (H', W').
    padding_mode: 'zeros' (outside -> 0) or 'reflection'."""
    h, w = x.shape[1], x.shape[2]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[None, :, :, None]
    wx = (xs - x0)[None, :, :, None]

    def gather(yi, xi):
        if padding_mode == 'reflection':
            yc = _reflect_index(yi, h).astype(jnp.int32)
            xc = _reflect_index(xi, w).astype(jnp.int32)
            return x[:, yc, xc]
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = x[:, yc, xc]  # (B, H', W', C)
        return vals * valid[None, :, :, None]

    top = gather(y0, x0) * (1 - wx) + gather(y0, x0 + 1) * wx
    bot = gather(y0 + 1, x0) * (1 - wx) + gather(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def rotate(x, angle_degrees):
    """Rotate NHWC tensor by `angle_degrees` (scalar, counter-clockwise in image
    coords — kornia convention) around the centre with bilinear sampling."""
    _, h, w, _ = x.shape
    theta = jnp.deg2rad(angle_degrees)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    # inverse mapping: output pixel pulls from input rotated by -angle
    xs = cos * (xx - cx) - sin * (yy - cy) + cx
    ys = sin * (xx - cx) + cos * (yy - cy) + cy
    return _grid_sample_bilinear(x, ys, xs)


def affine_warp(x, matrix, padding_mode='zeros'):
    """Apply inverse 2x3 affine `matrix` (output->input coords) to NHWC tensor."""
    _, h, w, _ = x.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    xs = matrix[0, 0] * xx + matrix[0, 1] * yy + matrix[0, 2]
    ys = matrix[1, 0] * xx + matrix[1, 1] * yy + matrix[1, 2]
    return _grid_sample_bilinear(x, ys, xs, padding_mode=padding_mode)


def random_affine(key, x, degrees=30.0, translate=0.2, padding_mode='reflection'):
    """Per-sample random rotation (±degrees) + translation (±translate·size)
    around the centre — the kornia RandomAffine equivalent used by
    FakeFakesGenerator (reference fake_fakes.py:8-18)."""
    import jax as _jax
    b, h, w, _ = x.shape
    k1, k2, k3 = _jax.random.split(key, 3)
    angles = jnp.deg2rad(_jax.random.uniform(k1, (b,), minval=-degrees, maxval=degrees))
    tx = _jax.random.uniform(k2, (b,), minval=-translate, maxval=translate) * w
    ty = _jax.random.uniform(k3, (b,), minval=-translate, maxval=translate) * h
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    def warp_one(img, c, s, dx, dy):
        # inverse map with rotation about centre then translation
        m = jnp.array([[c, -s, cx - c * cx + s * cy - dx],
                       [s, c, cy - s * cx - c * cy - dy]])
        return affine_warp(img[None], m, padding_mode=padding_mode)[0]

    return _jax.vmap(warp_one)(x, cos, sin, tx, ty)
