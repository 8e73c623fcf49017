"""Geometric warps (rotation / affine) via bilinear grid sampling, NHWC.

Replaces the reference's kornia dependency (spatial_transform.py:4,
fake_fakes.py:2-3, refinement.py:4-6). Convention matches kornia.rotate:
rotation around the image centre, bilinear sampling, zero padding outside.
"""
import jax.numpy as jnp


def _grid_sample_bilinear(x, ys, xs):
    """Sample NHWC `x` at float coords (ys, xs) of shape (H', W'); zeros outside."""
    h, w = x.shape[1], x.shape[2]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[None, :, :, None]
    wx = (xs - x0)[None, :, :, None]

    def gather(yi, xi):
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


def affine_warp(x, matrix):
    """Apply inverse 2x3 affine `matrix` (output->input coords) to NHWC tensor."""
    _, h, w, _ = x.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    xs = matrix[0, 0] * xx + matrix[0, 1] * yy + matrix[0, 2]
    ys = matrix[1, 0] * xx + matrix[1, 1] * yy + matrix[1, 2]
    return _grid_sample_bilinear(x, ys, xs)
