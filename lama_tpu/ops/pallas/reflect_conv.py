"""Pallas reflect-padded convolutions that match XLA's *zero*-pad conv speed.

Motivation (measured, v5e, big-lama 512² batch 16): XLA runs zero-padded
convs at ~100% MFU because the pad fuses into the conv read; reflect pads
(reference: ffc.py:190, pix2pixhd.py:54 use padding_mode='reflect' /
nn.ReflectionPad2d) must be materialised as concats, costing a full HBM
round trip of the padded tensor — +30-45% per conv at the FFC block shapes
and ~1.35 ms alone for the first stride-2 downsample at 512². A
zero-pad-everything probe measured 129.3 -> 142.3 img/s (+10%).

Two kernels, both building the reflect halo in VMEM so the padded tensor
never touches HBM:

1. `reflect_conv3x3_cols` — stride-1 3×3, whole image per grid step.
   Builds a full 9-tap im2col in VMEM scratch via lane-aligned stores
   (a single 9-way `jnp.concatenate` of sublane-shifted slices crashes the
   Mosaic compiler; per-tap stores at lane offsets t*C are fine), then ONE
   rank-3 dot with K=9C on the MXU. Measured 0.105 ms vs XLA-zero 0.100 /
   XLA-reflect 0.141 at (16,64,64,128)->128 — i.e. the reflect tax is gone.
   Wide-channel variants (384-in/out) measured SLOWER than XLA reflect
   (im2col store traffic dominates: 0.55 vs 0.44 ms), so the envelope is
   gated to C=C_out=128 — exactly the FFC l2l conv (36 instances).

2. `reflect_down_conv3x3` — stride-2 3×3 (the downsample convs). MEASURED
   NEGATIVE RESULT end to end: wins its micro-benchmark (4.0 ms vs 8.2 ms
   XLA-reflect at down1 512², where XLA's conv collapses on a concat-fed
   input) but REGRESSES big-lama end to end (129.3 -> 111.9 img/s) — in the
   full graph XLA fuses the reflect concat with the producer and runs the
   conv near zero-pad speed (~2 ms), while this kernel is capped by the
   ~170 GB/s single-DMA-stream Pallas pipeline (multi-spec splits don't
   parallelise it; manual make_async_copy crashes the toolchain's remote
   Mosaic compiler) plus an explicit 0.74 ms relayout for the width-pair
   view. Gated off in ops/conv.py (USE_PALLAS_REFLECT_S2=False); kept as
   the starting point for a fused multi-op downsample kernel. Row-tiled
   over (batch, H-tiles). The key trick: view the input as width-pairs
   (B, H, W/2, 2C) — a free bitcast — so the stride-2 column structure
   becomes a plain minor-dim contraction: one dot with K=3ky·2C and
   N=2C_out ({main taps kx=1,2 | left tap kx=0}), then one sublane-shifted
   f32 add folds the left-tap partial into the accumulator. Row stride-2 is
   handled with a rank-4 parity view (free: dim0 is untiled). The 1-row
   top halo per tile comes from a tiny precomputed boundary-rows tensor
   (1 row per tile) instead of DMA (manual `make_async_copy` from HBM
   crashes this toolchain's remote Mosaic compiler — see _kernel notes).

Mosaic constraints discovered while building these (kept here for future
kernel work): rank-3 strided slices and `rev` are unsupported; lane-dim
concat of sublane-shifted slices crashes the compiler (use scratch stores);
rank-4 reshapes/slices on untiled leading dims are free; lane slices at
64-offsets work; sublane-shifted f32 adds cost ~VMEM bandwidth only.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _diff_wrap(pallas_fn, stride: int):
    """Make a Pallas reflect-conv differentiable: forward runs the kernel,
    backward takes the VJP of the equivalent XLA reflect-pad+conv (pallas_call
    has no autodiff). The backward re-traces the XLA forward, so training
    pays one extra conv in bwd — inference (the hot path) is pure Pallas."""
    from ..pad import pad2d

    def xla_ref(x, kernel, bias):
        p = pad2d(x, ((1, 1), (1, 1)), mode='reflect')
        out = jax.lax.conv_general_dilated(
            p, kernel.astype(x.dtype), window_strides=(stride, stride),
            padding=((0, 0), (0, 0)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)

    @jax.custom_vjp
    def f(x, kernel, bias):
        return pallas_fn(x, kernel, bias=bias)

    def fwd(x, kernel, bias):
        return f(x, kernel, bias), (x, kernel, bias)

    def bwd(res, g):
        x, kernel, bias = res
        _, vjp = jax.vjp(xla_ref, x, kernel, bias)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# kernel 1: stride-1 3x3 reflect conv via VMEM im2col (C == C_out == 128)
# ---------------------------------------------------------------------------

def reflect_conv3x3_cols_supported(h: int, w: int, c: int, c_out: int) -> bool:
    if not (c == 128 and c_out == 128):
        return False
    # x + im2col scratch + f32 acc per grid step must fit in VMEM
    bytes_needed = (h + 2) * (w + 2) * c * 2 * 2 + h * w * 9 * c * 2 + h * w * c_out * 4
    return h >= 8 and w >= 8 and bytes_needed < 64 * 1024 * 1024


def _reflect_pad_hw(v, p: int = 1):
    """Reflect pad a (H, W, C) value in VMEM via row/col concats (supported
    by Mosaic; torch 'reflect' semantics: row -1 == row 1 etc.)."""
    h, w = v.shape[0], v.shape[1]
    rows_t = [v[j + 1:j + 2] for j in range(p - 1, -1, -1)]
    rows_b = [v[h - 2 - j:h - 1 - j] for j in range(p)]
    v = jnp.concatenate(rows_t + [v] + rows_b, axis=0)
    cols_l = [v[:, j + 1:j + 2] for j in range(p - 1, -1, -1)]
    cols_r = [v[:, w - 2 - j:w - 1 - j] for j in range(p)]
    return jnp.concatenate(cols_l + [v] + cols_r, axis=1)


def _cols_kernel(x_ref, w_ref, b_ref, o_ref, cols, *, dtype, use_bias):
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    p = _reflect_pad_hw(x_ref[0]).astype(dtype)
    t = 0
    for ky in range(3):
        for kx in range(3):
            cols[:, :, t * c:(t + 1) * c] = p[ky:ky + h, kx:kx + w, :]
            t += 1
    acc = jax.lax.dot_general(cols[...], w_ref[...].astype(dtype),
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if use_bias:
        acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def reflect_conv3x3_cols(x, kernel, bias=None, dtype=jnp.bfloat16,
                         interpret: bool = False):
    """== conv2d(x, kernel, padding=1, padding_mode='reflect') [+ bias].
    x: (B, H, W, C) NHWC; kernel: (3, 3, C, C') HWIO."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    c_out = kernel.shape[-1]
    wk = kernel.reshape(9 * c, c_out).astype(dtype)   # K idx = (ky*3+kx)*c + ci
    use_bias = bias is not None
    bias_arg = (bias if use_bias else jnp.zeros((c_out,), x.dtype))
    out = pl.pallas_call(
        functools.partial(_cols_kernel, dtype=dtype, use_bias=use_bias),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, w, 9 * c), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * c * c_out,
            bytes_accessed=b * h * w * (c + c_out) * 2 + 9 * c * c_out * 2,
            transcendentals=0),
        interpret=interpret,
    )(x.astype(dtype), wk, bias_arg)
    return out


# ---------------------------------------------------------------------------
# kernel 2: stride-2 3x3 reflect conv (downsample) via width-pair packing
# ---------------------------------------------------------------------------

_TRS = 256  # input rows per tile (must divide H). Large tiles matter: the
# Pallas auto-pipeline streams blocks at ~170 GB/s (single DMA stream), so
# per-step overheads dominate with small tiles (measured 8.1 ms at TRS=64 vs
# 4.0 ms at TRS=256 for down1 @512²; XLA's reflect path is 8.2 ms, its
# zero-pad path 1.5 ms — concat/DUS-fed convs hit a pathological XLA path,
# which is why this kernel exists).


def reflect_down_conv3x3_supported(h: int, w: int, c: int, c_out: int) -> bool:
    c2 = 2 * c
    if c2 % 128 != 0 or c_out % 128 != 0:
        return False
    if h % 2 or w % 2 or h < 8 or w < 8:
        return False
    trs = min(h, _TRS)
    if h % trs:
        return False
    # double-buffered in/out blocks + band + f32 pair-acc per step
    w2 = w // 2
    bytes_needed = (2 * trs * w2 * c2 * 2 + (trs // 2) * w2 * 3 * c2 * 2
                    + (trs // 2) * w2 * 2 * c_out * 4
                    + 2 * (trs // 2) * w2 * c_out * 2)
    return bytes_needed < 112 * 1024 * 1024


def _down_kernel(brow_ref, xv_ref, w_ref, b_ref, o_ref, *, dtype, use_bias):
    trs, w2, c2 = xv_ref.shape[1], xv_ref.shape[2], xv_ref.shape[3]
    tro = trs // 2
    co = o_ref.shape[3]
    # buf row j == input row (tile_start - 1 + j); brow is row tile_start-1
    # (reflect row 1 for the first tile — precomputed outside).
    buf = jnp.concatenate([brow_ref[0], xv_ref[0]], axis=0)   # (trs+1, w2, c2)
    view = buf[0:trs].reshape(tro, 2, w2, c2)                  # row parity view
    r_ky0 = view[:, 0]                                         # rows 2r
    r_ky1 = view[:, 1]                                         # rows 2r+1
    r_ky2 = jnp.concatenate([view[1:, 0], buf[trs:trs + 1]], axis=0)  # rows 2r+2
    band = jnp.concatenate([r_ky0, r_ky1, r_ky2], axis=-1).astype(dtype)
    # ONE dot: N = {main taps kx=1,2 | left tap kx=0 (prev pair, slot1)}
    full = jax.lax.dot_general(band, w_ref[...].astype(dtype),
                               (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    main = full[:, :, :co]
    left = full[:, :, co:]
    # out col 0's left tap is reflect(col -1) == col 1 == pair0/slot1 == left[:,0]
    acc = main + jnp.concatenate([left[:, 0:1], left[:, :-1]], axis=1)
    if use_bias:
        acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _down_weights(kernel, dtype):
    """HWIO (3,3,C,Co) -> (3*2C, 2Co): K idx = ky*2C + slot*C + ci with
    {slot0: tap kx=1, slot1: tap kx=2} for the main N-half and
    {slot0: 0, slot1: tap kx=0} for the left N-half."""
    c, co = kernel.shape[2], kernel.shape[3]
    k = kernel.astype(jnp.float32)
    main = jnp.concatenate([k[:, 1], k[:, 2]], axis=1)          # (3, 2C, Co)
    left = jnp.concatenate([jnp.zeros_like(k[:, 0]), k[:, 0]], axis=1)
    wk = jnp.concatenate([main, left], axis=-1)                 # (3, 2C, 2Co)
    return wk.reshape(3 * 2 * c, 2 * co).astype(dtype)


def reflect_down_conv3x3(x, kernel, bias=None, dtype=jnp.bfloat16,
                         interpret: bool = False):
    """== conv2d(x, kernel, stride=2, padding=1, padding_mode='reflect')
    [+ bias]. x: (B, H, W, C) NHWC; kernel: (3, 3, C, C') HWIO."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    c_out = kernel.shape[-1]
    w2, c2 = w // 2, 2 * c
    trs = min(h, _TRS)
    n_tiles = h // trs
    xv = x.reshape(b, h, w2, c2)                                # free bitcast
    # boundary rows: tile t needs input row t*trs - 1; t=0 reflects to row 1
    brows = jnp.concatenate([xv[:, 1:2], xv[:, trs - 1:h - 1:trs]], axis=1)
    wk = _down_weights(kernel, dtype)
    use_bias = bias is not None
    bias_arg = (bias if use_bias else jnp.zeros((c_out,), x.dtype))
    out = pl.pallas_call(
        functools.partial(_down_kernel, dtype=dtype, use_bias=use_bias),
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1, 1, w2, c2), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, trs, w2, c2), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, trs // 2, w2, c_out),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w2, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h // 2) * w2 * 12 * c * c_out,
            bytes_accessed=b * h * w2 * c2 * 2 + b * (h // 2) * w2 * c_out * 2,
            transcendentals=0),
        interpret=interpret,
    )(brows.astype(dtype), xv.astype(dtype), wk, bias_arg)
    return out


# ---------------------------------------------------------------------------
# kernel 3: 7x7 stride-1 reflect conv with TINY output channels (the RGB
# out_conv: 64 -> 3 @ 512², reference ffc.py:370 model head)
# ---------------------------------------------------------------------------
#
# Why: XLA emits conv output channels on the 128-lane dim, so C_out=3 runs at
# 3/128 MXU utilisation — PROFILED at 17.9 ms for ONE op (14% of the whole
# big-lama forward); forcing NCHW output dimension_numbers does not change
# the emitter (measured 21.3 ms either way). This kernel computes the
# TRANSPOSED form instead: out_t(co, r, w) with co on the 8-sublane dim
# (3 -> 8 pad = 37.5% eff, 16x better) and W on the lanes, as 49 per-tap
# rank-3 middle-contraction dots (3,C)x(TR,C,W). Streaming the 537 MB input
# through the ~170 GB/s Pallas pipeline floors it at ~3.2 ms — still ~5x
# faster than XLA's lane-padded form.

_OUT_TR = 128  # rows per tile


def reflect_out_conv7x7_supported(h: int, w: int, c: int, c_out: int) -> bool:
    if c_out > 8 or c > 128 or c % 8 != 0:
        return False
    if h < 8 or w < 8:
        return False
    tr = min(h, _OUT_TR)
    if h % tr:
        return False
    # buf + transposed + per-ky slices + f32 acc
    bytes_needed = ((tr + 6) * (w + 6) * c * 2 * 3
                    + 8 * tr * (w + 6) * 4 + 2 * tr * w * c * 2)
    return bytes_needed < 100 * 1024 * 1024


def _out7_kernel(top_ref, x_ref, bot_ref, w_ref, o_ref, *, dtype):
    tr, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    co = o_ref.shape[1]
    buf = jnp.concatenate([top_ref[0, 0], x_ref[0], bot_ref[0, 0]], axis=0)
    # reflect pad cols (±3)
    cols_l = [buf[:, j + 1:j + 2] for j in range(2, -1, -1)]
    cols_r = [buf[:, w - 2 - j:w - 1 - j] for j in range(3)]
    p = jnp.concatenate(cols_l + [buf] + cols_r, axis=1)   # (tr+6, w+6, c)
    xt = jnp.swapaxes(p, 1, 2).astype(dtype)               # (tr+6, c, w+6)
    acc = None
    for ky in range(7):
        rows = xt[ky:ky + tr]                              # (tr, c, w+6)
        for kx in range(7):
            rhs = rows[:, :, kx:kx + w]                    # (tr, c, w)
            t = jax.lax.dot_general(
                w_ref[ky, kx].astype(dtype), rhs,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (co, tr, w)
            acc = t if acc is None else acc + t
    o_ref[0] = acc.astype(o_ref.dtype)


def reflect_out_conv7x7(x, kernel, bias=None, dtype=jnp.bfloat16,
                        interpret: bool = False):
    """== conv2d(x, kernel, padding=3, padding_mode='reflect') [+ bias]
    for small C_out. x: (B, H, W, C) NHWC; kernel: (7, 7, C, C') HWIO;
    returns NHWC (internally computed NCHW + one cheap transpose)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    c_out = kernel.shape[-1]
    tr = min(h, _OUT_TR)
    n_tiles = h // tr
    # halo strips per tile: rows [t*tr-3, t*tr) and [(t+1)*tr, (t+1)*tr+3),
    # reflected at the image borders (torch reflect: row -j == row j)
    top_first = x[:, 3:0:-1]                               # rows 3,2,1
    bot_last = x[:, h - 2:h - 5:-1]                        # rows h-2,h-3,h-4
    if n_tiles > 1:
        inner_top = jnp.stack([x[:, t * tr - 3:t * tr]
                               for t in range(1, n_tiles)], axis=1)
        inner_bot = jnp.stack([x[:, (t + 1) * tr:(t + 1) * tr + 3]
                               for t in range(n_tiles - 1)], axis=1)
        tops = jnp.concatenate([top_first[:, None], inner_top], axis=1)
        bots = jnp.concatenate([inner_bot, bot_last[:, None]], axis=1)
    else:
        tops = top_first[:, None]
        bots = bot_last[:, None]
    wt = jnp.transpose(kernel, (0, 1, 3, 2)).astype(dtype)  # (7,7,co,c)
    out_t = pl.pallas_call(
        functools.partial(_out7_kernel, dtype=dtype),
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1, 1, 3, w, c), lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tr, w, c), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 3, w, c), lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c_out, tr, w), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_out, h, w), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=('parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 49 * c * c_out,
            bytes_accessed=b * h * w * c * 2 + b * h * w * c_out * 2,
            transcendentals=0),
        interpret=interpret,
    )(tops, x.astype(dtype), bots, wt)
    out = jnp.transpose(out_t, (0, 2, 3, 1))
    if bias is not None:
        # bias applied NHWC-side: fuses with the (cheap) layout transpose
        out = out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)
    return out


def _diff_wrap7(pallas_fn):
    """custom_vjp wrapper for the 7x7 out conv (backward = XLA reflect)."""
    from ..pad import pad2d

    def xla_ref(x, kernel, bias):
        p = pad2d(x, ((3, 3), (3, 3)), mode='reflect')
        out = jax.lax.conv_general_dilated(
            p, kernel.astype(x.dtype), window_strides=(1, 1),
            padding=((0, 0), (0, 0)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)

    @jax.custom_vjp
    def f(x, kernel, bias):
        return pallas_fn(x, kernel, bias=bias)

    def fwd(x, kernel, bias):
        return f(x, kernel, bias), (x, kernel, bias)

    def bwd(res, g):
        x, kernel, bias = res
        _, vjp = jax.vjp(xla_ref, x, kernel, bias)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


# differentiable entry points (bias must be a real array; pass zeros if none)
reflect_conv3x3_cols_vjp = _diff_wrap(reflect_conv3x3_cols, stride=1)
reflect_down_conv3x3_vjp = _diff_wrap(reflect_down_conv3x3, stride=2)
reflect_out_conv7x7_vjp = _diff_wrap7(reflect_out_conv7x7)


# ---------------------------------------------------------------------------
# kernel 4: stride-1 3x3 reflect conv for WIDE channels via per-tap dots
# ---------------------------------------------------------------------------
#
# Kernel 1's im2col form loses for C>128 (the 9C-wide scratch store traffic
# dominates: 0.55 vs XLA's 0.44 ms at 384 channels). This variant never
# materialises the im2col: 9 accumulated rank-3 dots (h,w,c)x(c,co) straight
# off sublane/lane-aligned windows of the reflect-padded VMEM buffer — the
# same per-tap-dot pattern the 7x7 out-head kernel compiles with. Targets the
# FFC bottleneck's l2g (128->384) and g2l (384->128) convs (72 instances).
#
# MEASURED NEGATIVE RESULT (v5e, isolated, probes/_t_taps_conv.py, bf16
# (16,64,64,·)): 128->384: 0.881 vs XLA-reflect 0.849 ms; 384->128: 0.967 vs
# 0.880; 384->384: 1.806 vs 1.494. XLA's reflect conv also matches its
# zero-pad conv at these shapes (the reflect tax concentrates at >=256²
# spatial, not in the bottleneck), so there is nothing for a halo kernel to
# win back here. NOT wired into ops/conv.py dispatch; kept as the
# per-tap-dot reference implementation (interpret-parity tested).

def reflect_conv3x3_taps_supported(h: int, w: int, c: int, c_out: int) -> bool:
    if c % 128 or c_out % 128:
        return False
    if c == 128 and c_out == 128:
        return False  # kernel 1 (im2col) measured faster at that shape
    if h < 8 or w < 8:
        return False
    bytes_needed = ((h + 2) * (w + 2) * c * 2 * 2   # in block + padded buf
                    + h * w * c_out * 4             # f32 acc
                    + 2 * h * w * c_out * 2)        # out block (dbl buffered)
    return bytes_needed < 100 * 1024 * 1024


def _taps_kernel(x_ref, w_ref, b_ref, o_ref, *, dtype, use_bias):
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    p = _reflect_pad_hw(x_ref[0]).astype(dtype)
    acc = None
    for ky in range(3):
        for kx in range(3):
            win = p[ky:ky + h, kx:kx + w, :]
            t = jax.lax.dot_general(win, w_ref[ky, kx].astype(dtype),
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    if use_bias:
        acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def reflect_conv3x3_taps(x, kernel, bias=None, dtype=jnp.bfloat16,
                         interpret: bool = False):
    """== conv2d(x, kernel, padding=1, padding_mode='reflect') [+ bias].
    x: (B, H, W, C) NHWC; kernel: (3, 3, C, C') HWIO."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    c_out = kernel.shape[-1]
    use_bias = bias is not None
    bias_arg = (bias if use_bias else jnp.zeros((c_out,), x.dtype))
    out = pl.pallas_call(
        functools.partial(_taps_kernel, dtype=dtype, use_bias=use_bias),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(x.astype(dtype), kernel.astype(dtype), bias_arg)
    return out


reflect_conv3x3_taps_vjp = _diff_wrap(reflect_conv3x3_taps, stride=1)
