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
from jax.experimental import pallas as pl


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


# ---------------------------------------------------------------------------
# Row-tiled strided halo conv — the round-2 kernel targeting the +11%
# zero-pad headroom (BASELINE.md): the reflect pads that matter are the
# LARGE-resolution ones (stride-2 3x3 downsamples at 512^2/256^2/128^2 and the
# 7x7 output conv at 512^2), whose padded-tensor materialisation costs a full
# HBM round trip (~32MB each at 512^2x64ch). This kernel tiles output rows,
# fetches the 1- or 3-row halos as separate tiny block operands of the SAME
# input array (clamped index maps; boundary tiles rebuild the reflect halo
# from in-tile rows), reflect-pads W in VMEM, and accumulates k*k per-tap
# (To, W, C)x(C, C') dot_generals in f32. Stride 2 is applied on rows via a
# free outer-dim reshape and on columns via one output-sized reshape-slice
# (2x W-compute at ~single-digit baseline MFU is cheaper than the HBM round
# trip it removes).
# ---------------------------------------------------------------------------

def _rev_rows(x, p):
    return jnp.concatenate([x[j:j + 1] for j in range(p - 1, -1, -1)], axis=0)


def _tiled_kernel(body_ref, top_ref, bot_ref, w_ref, b_ref, o_ref,
                  *, k, p, s, to_rows, q, w_in, dtype):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    x = body_ref[0]                     # (Ti, W, C)
    ti = to_rows * s

    # ---- row halos: interior tiles use the neighbour-block rows; boundary
    # tiles rebuild torch-reflect rows from in-tile data
    top_in = top_ref[0][q - p:]         # rows [i*Ti - p, i*Ti)
    top_refl = _rev_rows(x[1:p + 1], p)     # rows -1..-p -> 1..p
    top_halo = jnp.where(i == 0, top_refl, top_in)
    bot_in = bot_ref[0][:p]             # rows [(i+1)*Ti, +p)
    bot_refl = _rev_rows(x[ti - 1 - p: ti - 1], p)  # rows H..H+p-1 -> H-2..
    bot_halo = jnp.where(i == n - 1, bot_refl, bot_in)
    xp = jnp.concatenate([top_halo, x, bot_halo], axis=0)   # (Ti+2p, W, C)

    # ---- reflect pad W in VMEM (p single-column slices each side)
    left = [xp[:, j:j + 1] for j in range(p, 0, -1)]
    right = [xp[:, w_in - 2 - j: w_in - 1 - j] for j in range(p)]
    xp = jnp.concatenate(left + [xp] + right, axis=1)       # (Ti+2p, W+2p, C)

    acc = None
    for ky in range(k):
        rows_k = xp[ky: ky + ti]                            # (Ti, W+2p, C)
        if s == 2:
            # row stride via outer-dim reshape (layout-free)
            rows_k = rows_k.reshape(to_rows, 2, *rows_k.shape[1:])[:, 0]
        for kx in range(k):
            win = rows_k[:, kx: kx + w_in]                  # (To, W, C)
            tap = jax.lax.dot_general(
                win.astype(dtype), w_ref[ky, kx].astype(dtype),
                (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            acc = tap if acc is None else acc + tap         # (To, W, C') f32
    if s == 2:
        acc = acc.reshape(acc.shape[0], acc.shape[1] // 2, 2, acc.shape[2])[:, :, 0]
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def halo_conv_reflect_tiled_supported(h, w, c, c_out, k, s):
    if k not in (3, 7) or s not in (1, 2):
        return False
    if c < 8 or c % 8 or w % 128 or h % (16 * s):
        return False
    ho, to = h // s, 16
    if ho % to:
        return False
    # per-step VMEM: double-buffered body + out, f32 accumulator, weights
    ti = to * s
    body = ti * w * c * 2
    accb = to * w * max(c_out, 128) * 4
    outb = to * (w // s) * max(c_out, 128) * 2
    wb = k * k * c * c_out * 2
    return 2 * body + accb + 2 * outb + wb < 13 * 1024 * 1024


def halo_conv_reflect_tiled(x, kernel, bias=None, stride=1,
                            dtype=jnp.bfloat16, interpret=False):
    """Row-tiled reflect-padded conv: x (B,H,W,C) NHWC bf16, kernel (k,k,C,C')
    HWIO, p = k//2 'same' padding, stride 1 or 2. Bit-equivalent to
    pad2d(reflect) + conv (parity-tested vs torch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    k = kernel.shape[0]
    c_out = kernel.shape[-1]
    p, s = k // 2, stride
    ho, wo = h // s, w // s
    to = 16
    ti = to * s
    q = p if ti % max(p, 1) == 0 and p in (1, 2) else 4   # halo block rows
    assert ti % q == 0 and h % q == 0, (ti, q, h)
    r = ti // q
    n = ho // to
    if bias is None:
        bias = jnp.zeros((c_out,), x.dtype)

    grid = (b, n)
    out = pl.pallas_call(
        functools.partial(_tiled_kernel, k=k, p=p, s=s, to_rows=to, q=q,
                          w_in=w, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ti, w, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, w, c),
                         lambda bi, i: (bi, jnp.maximum(i * r - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, w, c),
                         lambda bi, i: (bi, jnp.minimum((i + 1) * r, h // q - 1),
                                        0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, to, wo, c_out), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ho * w * k * k * c * c_out,
            bytes_accessed=b * (h * w * c + ho * wo * c_out) * 2
            + k * k * c * c_out * 2,
            transcendentals=0),
        interpret=interpret,
    )(x.astype(dtype), x.astype(dtype), x.astype(dtype), kernel.astype(dtype),
      bias.reshape(1, c_out))
    return out
