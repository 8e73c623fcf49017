"""Space-to-depth convolution transform — the TPU fix for thin-channel convs.

Why: XLA lowers a conv's channel dims onto MXU lanes (128) padded with zeros.
big-lama's stem (7x7, 4->64 @512^2) and output head (7x7, 64->3 @512^2) burn
32-42x of their FLOPs on that padding (~34 ms of a ~124 ms forward, measured
round 2 — see BASELINE.md). The cure is algebraic: pack a x a input subpixels
into channels (space-to-depth), pack g x g = (a/stride)^2 output subpixels
into channels, and run ONE dense conv whose channel dims are MXU-sized. The
re-packed kernel places the original taps at

    ky = a*KY + dyi - s*dyo      (and likewise for x),

zero elsewhere; reflect padding (p = k//2) is applied before the transform so
semantics are exactly `reflect-pad + conv` (parity-tested vs torch).

Everything is plain XLA (reshape/transpose/gather/conv) — differentiable,
CPU-testable, no custom kernels. The per-shape s2d factor `a` is chosen
empirically (see BASELINE.md measurements); the dispatcher only fires where
the dense conv wins.
"""
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .pad import pad2d


def _ceil_to(v, m):
    return -(-v // m) * m


@functools.lru_cache(maxsize=None)
def _gather_indices(k: int, a: int, s: int):
    """Static index/validity tables mapping the packed kernel position
    (KY, dyi, dyo) back to the original tap ky = a*KY + dyi - s*dyo."""
    g = a // s
    t = (a - s + k - 1) // a + 1  # packed kernel size
    idx = np.zeros((t, a, g), np.int32)
    for big_k in range(t):
        for di in range(a):
            for do in range(g):
                ky = a * big_k + di - s * do
                idx[big_k, di, do] = ky if 0 <= ky < k else k  # k -> zero row
    return t, idx


def pack_kernel(kernel, a: int, s: int):
    """(k, k, C, C') HWIO -> (T, T, a*a*C, g*g*C') for the s2d domain."""
    k, _, c, c_out = kernel.shape
    g = a // s
    t, idx = _gather_indices(k, a, s)
    kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # row/col k == 0
    # gather -> (Ty, ayi, gyo, Tx, axi, gxo, C, C')
    w = kp[idx[:, :, :, None, None, None], idx[None, None, None]]
    # -> (Ty, Tx, ayi, axi, C, gyo, gxo, C') -> (T, T, a^2 C, g^2 C')
    w = w.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return w.reshape(t, t, a * a * c, g * g * c_out)


def space_to_depth(x, a: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // a, a, w // a, a, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // a, w // a, a * a * c)


def depth_to_space(x, g: int):
    b, h, w, c = x.shape
    c_out = c // (g * g)
    x = x.reshape(b, h, w, g, g, c_out)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * g, w * g, c_out)


def conv2d_reflect_s2d(x, kernel, bias=None, stride: int = 1, a: int = 2,
                       padding_mode: str = 'reflect'):
    """reflect-pad(k//2) + conv(stride) computed in the space-to-depth domain.
    x: (B, H, W, C) NHWC; kernel: (k, k, C, C') HWIO; stride | a;
    H, W divisible by a. Returns (B, H/s, W/s, C')."""
    b, h, w_in, c = x.shape
    k = kernel.shape[0]
    c_out = kernel.shape[-1]
    p, s = k // 2, stride
    g = a // s
    ho, wo = h // s, w_in // s
    t, _ = _gather_indices(k, a, s)

    xp = pad2d(x, ((p, p), (p, p)), mode=padding_mode)
    # align padded dims up to a multiple of a with unread zero rows/cols:
    # max padded row read = (ho - 1)*s + k - 1 < h + 2p <= aligned size
    ah = _ceil_to(h + 2 * p, a)
    aw = _ceil_to(w_in + 2 * p, a)
    xp = jnp.pad(xp, ((0, 0), (0, ah - h - 2 * p), (0, aw - w_in - 2 * p),
                      (0, 0)))
    xs = space_to_depth(xp, a)

    wp = pack_kernel(kernel, a, s)
    out = jax.lax.conv_general_dilated(
        xs, wp, (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    out = out[:, :ho // g, :wo // g]
    out = depth_to_space(out, g).astype(x.dtype)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1).astype(out.dtype)
    return out


# Serving option `s2d_out_head=true` (ServingMode.s2d='out_head'): restrict
# the s2d dispatch to the thin-OUTPUT head only. The bf16-era in-graph
# measurement of the full table was NEGATIVE (fusion breaks, BASELINE.md
# round 2), but under the round-4 int8+static+zero-pad+bf16-store program
# the out-head-only case RE-MEASURED as a win: 78.0 -> 76.2 ms/batch
# (+2.4%, 209.9 img/s, back-to-back one-process side-by-side,
# probes/_t_int8_profile.py s2d_out). Exact semantics (reflect-pad + conv
# algebra, parity-tested vs torch in tests/test_s2d_conv.py) — no quality
# gate needed.
#
# Round 5 upgraded the out-head dispatch from the s2d-domain conv to the
# PHASE conv below: the round-5 decomposition probe (probes/_t_out_head_iso
# .py) showed the s2d path's cost is NOT the packed conv (2.8 ms) but the
# materialisation of the 543 MB space-to-depth transpose feeding it
# (~9.5 ms of the 15.9 ms total, vs a ~1.3 ms copy roofline). The phase
# conv reads the reflect-padded input in its ORIGINAL NHWC layout with a
# strided window instead — no s2d transpose exists at all. Isolated:
# 15.92 -> 6.90 ms (2.3x); the conv core alone is 2.59 ms ≈ its 1.6 ms
# compute roofline (316 GFLOP at the head shape).


def _phase_gather_idx(k: int, a: int):
    """idx[t, d] = original tap t - d (the phase-conv scatter), k -> zero."""
    t_sz = k + a - 1
    idx = np.zeros((t_sz, a), np.int32)
    for t in range(t_sz):
        for d in range(a):
            ky = t - d
            idx[t, d] = ky if 0 <= ky < k else k
    return t_sz, idx


def pack_kernel_phase(kernel, a: int):
    """(k, k, C, C') HWIO -> (k+a-1, k+a-1, C, a*a*C') for the stride-a
    phase conv: output channel (dy, dx, c') holds tap (t-dy, t-dx)."""
    k, _, c, c_out = kernel.shape
    t_sz, idx = _phase_gather_idx(k, a)
    kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # row/col k == 0
    # gather -> (Ty, dy, Tx, dx, C, C') -> (Ty, Tx, C, dy, dx, C')
    w = kp[idx[:, :, None, None], idx[None, None]]
    w = w.transpose(0, 2, 4, 1, 3, 5)
    return w.reshape(t_sz, t_sz, c, a * a * c_out)


def conv2d_reflect_phase(x, kernel, bias=None, a: int = 8,
                         padding_mode: str = 'reflect'):
    """reflect-pad(k//2) + stride-1 conv, computed as ONE stride-`a` conv
    over the padded input whose output channels are the a x a output phases
    (depth-to-space'd back). Exact reflect-pad + conv semantics; unlike
    conv2d_reflect_s2d the INPUT is never space-to-depth repacked — the
    strided conv window does the blocking, so the 2H x 2W transpose
    materialisation (the dominant cost of the s2d path, see above)
    disappears. Requires stride 1 and H, W divisible by a."""
    b, h, w_in, c = x.shape
    k = kernel.shape[0]
    p = k // 2
    xp = pad2d(x, ((p, p), (p, p)), mode=padding_mode)
    wp = pack_kernel_phase(kernel, a)
    out = jax.lax.conv_general_dilated(
        xp, wp, (a, a), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    out = depth_to_space(out, a).astype(x.dtype)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1).astype(out.dtype)
    return out


def conv2d_reflect_phase_zsplit(x, kernel, bias=None, a: int = 8,
                                padding_mode: str = 'reflect'):
    """Exact reflect-pad + stride-1 conv with NO materialised pad tensor.

    The phase conv above still reflect-pads the input first — at the out-head
    shape that pad is a ~549 MB copy of a ~543 MB tensor (B16 x 518^2 x 64
    bf16), ~4.3 ms of write+read traffic for 6 rows/cols of actual new
    values (round-5 isolation: phase 6.90 ms vs phase_nopad 2.59 ms).
    Zero padding and reflect padding agree everywhere the conv window stays
    in bounds, so instead: (1) run the stride-`a` phase conv with XLA-NATIVE
    zero padding (lax pads lazily inside the conv — no padded copy exists),
    then (2) recompute the p-row/col border strips with true reflect
    semantics from thin slices of x and paste them. The strips read/write
    O(p/H) of the tensor — compute noise at the head shape.
    Same products as reflect-pad + conv (reassociation class only)."""
    b, h, w_in, c = x.shape
    k = kernel.shape[0]
    p = k // 2
    c_out = kernel.shape[-1]
    if padding_mode != 'reflect' or h < 4 * p or w_in < 4 * p:
        return conv2d_reflect_phase(x, kernel, bias=bias, a=a,
                                    padding_mode=padding_mode)
    wp = pack_kernel_phase(kernel, a)
    core = jax.lax.conv_general_dilated(
        x, wp, (a, a), ((p, p), (p, p)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    out = depth_to_space(core, a)  # (b, h, w, c_out) f32

    def strip(xs, pads):
        xs = pad2d(xs, pads, mode=padding_mode)
        return jax.lax.conv_general_dilated(
            xs, kernel, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)

    # outputs y < p read original rows [y-p, y+p] <= [-p, 2p-1]; ditto the
    # other three borders. Top/bottom strips span the full width (reflect on
    # both column borders), so left/right strips only cover y in [p, h-p).
    top = strip(x[:, :2 * p], ((p, 0), (p, p)))
    bot = strip(x[:, h - 2 * p:], ((0, p), (p, p)))
    lef = strip(x[:, :, :2 * p], ((0, 0), (p, 0)))
    rig = strip(x[:, :, w_in - 2 * p:], ((0, 0), (0, p)))
    out = out.at[:, :p].set(top)
    out = out.at[:, h - p:].set(bot)
    out = out.at[:, p:h - p, :p].set(lef)
    out = out.at[:, p:h - p, w_in - p:].set(rig)
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1).astype(out.dtype)
    return out


def conv2d_reflect_xfold(x, kernel, bias=None, padding_mode: str = 'reflect'):
    """reflect-pad + stride-1 conv for THIN-INPUT convs (the stem: 7x7,
    C=4): fold the kernel's kx taps into input channels (partial im2col
    along x only) so the MXU contraction dim becomes k*C instead of C.

    The fold is k shifted SLICES concatenated on the channel axis — each
    slice is a contiguous copy (no lane-crossing permute, unlike the s2d
    transpose that sank the full-table s2d path, see above). The conv
    collapses to (k, 1) spatial taps over k*C channels: same products,
    conv reassociation class only. Stem shape maths: contraction 4 -> 28
    lanes, fold traffic ~0.5 GB/batch (~0.6 ms) vs the 32x lane padding
    waste of the direct conv (measured 5.46 ms, ~8x its roofline).

    MEASURED in-graph NEGATIVE (2026-08-20, ServingMode.xfold_stem under
    the round-5 headline program): 70.9 -> 117.2 ms/batch — the shifted-
    slice concat materialises at full resolution and severs the stem from
    its producer fusion. Kept for probes; do not re-wire."""
    b, h, w_in, c = x.shape
    k = kernel.shape[0]
    p = k // 2
    xp = pad2d(x, ((p, p), (p, p)), mode=padding_mode)
    xf = jnp.concatenate([xp[:, :, dx:dx + w_in, :] for dx in range(k)],
                         axis=-1)
    # xf channel index = dx*c + ci == kernel.reshape(k, k*c, co) kx-major
    wf = kernel.reshape(k, 1, k * c, kernel.shape[-1])
    out = jax.lax.conv_general_dilated(
        xf, wf, (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1).astype(out.dtype)
    return out


def s2d_factor_for(h: int, w: int, c: int, c_out: int, k: int, s: int,
                   out_head_only: bool = False):
    """Per-shape s2d factor from v5e measurements (BASELINE.md round 2):
    stem-like 7x7 thin-input convs win at a=2 (7.0 -> 4.4 ms isolated),
    head-like 7x7 thin-output convs at a=8 (23.0 -> 17.7 isolated; the s2d
    transpose fuses further in-graph), stride-2 64ch downsamples at a=2.
    None = plain conv is at least as good for this shape."""
    if s not in (1, 2) or h < 256 or h % 16 or w % 16:
        return None
    if out_head_only:
        return 8 if (k == 7 and s == 1 and c_out <= 8) else None
    if k == 7 and s == 1 and c <= 8:
        return 2
    if k == 7 and s == 1 and c_out <= 8:
        return 8
    if k == 3 and s == 2 and c <= 64 and c_out <= 128:
        return 2
    return None
