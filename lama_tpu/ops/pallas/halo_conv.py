"""Pallas halo conv: reflect-padded 3×3 stride-1 convolution with the halo
built in VMEM — no HBM round-trip for the padded tensor.

Reflect pads cost ~10% of big-lama end to end (zero-pad probe: 128.6 -> 142.7
img/s on v5e); the FFC bottleneck block convs (~108 reflect-padded 3×3 convs
at 64² per forward) account for most instances. This kernel loads the
unpadded tile, builds the 1-pixel reflected halo with VMEM slices/concats,
and accumulates the conv as 9 per-tap rank-3 dot_generals (minor-dim
contraction — the Mosaic-supported form), each an (H, W, C)·(C, C') matmul.

Supported envelope: stride 1, dilation 1, groups 1, k=3, p=1, full image in
VMEM (H·W·C small enough). Falls back to the pad+conv path otherwise.

MEASURED (v5e, big-lama 512² batch 16): bit-exact vs pad+conv; isolated
micro-bench tied (0.93 vs 0.89 ms at 64²x128ch), end-to-end 130.7 vs 129.3
img/s (~1%, within relay noise) — the 64² block pads are NOT the expensive
ones; the +11% zero-pad headroom lives in the 512²/256² stride-2 downsample
and 7×7 stem/out convs, which need a row-tiled halo kernel with stride
support (round-2 work). Flag-gated off by default (ops/conv.USE_HALO_CONV).
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp


def halo_conv3x3_supported(h: int, w: int, c: int, c_out: int) -> bool:
    # x + padded + f32 acc must fit comfortably in ~16MB VMEM
    bytes_needed = 2 * h * w * c * 2 + (h + 2) * (w + 2) * c * 2 + h * w * c_out * 4
    return bytes_needed < 9 * 1024 * 1024


def _kernel(x_ref, w_ref, o_ref, *, dtype):
    x = x_ref[0]                                        # (H, W, C)
    # reflected halo: row/col 1 mirrored outside row/col 0 etc. (torch reflect)
    p = jnp.concatenate([x[1:2], x, x[-2:-1]], axis=0)
    p = jnp.concatenate([p[:, 1:2], p, p[:, -2:-1]], axis=1)
    h, w = x.shape[0], x.shape[1]

    acc = None
    for ky in range(3):
        for kx in range(3):
            win = p[ky:ky + h, kx:kx + w, :]
            tap = jax.lax.dot_general(
                win.astype(dtype), w_ref[ky, kx].astype(dtype),
                (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            acc = tap if acc is None else acc + tap
    o_ref[0] = acc.astype(o_ref.dtype)


def halo_conv3x3_reflect(x, kernel, bias=None, dtype=jnp.bfloat16):
    """x: (B, H, W, C) NHWC; kernel: (3, 3, C, C') HWIO; returns (B, H, W, C')
    == conv2d(x, kernel, padding=1, padding_mode='reflect')."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    c_out = kernel.shape[-1]
    out = pl.pallas_call(
        functools.partial(_kernel, dtype=dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * c * c_out,
            bytes_accessed=b * h * w * (c + c_out) * 2 + 9 * c * c_out * 2,
            transcendentals=0),
    )(x.astype(dtype), kernel)
    if bias is not None:
        out = out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)
    return out
