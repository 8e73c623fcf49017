"""Fused FourierUnit Pallas kernel — the whole spectral unit in VMEM.

The FourierUnit inference path (models/ffc.py::FourierUnit, reference
ffc.py:76-113) is a chain of five matmuls with elementwise ops between:

  rfft2 (W-DFT, H-DFT) → 1×1 conv → BN → ReLU → irfft2 (H-iDFT, W-iDFT)

Under XLA each matmul round-trips its operands through HBM (fusion does not
cross contractions), ~10 intermediate tensors per call; big-lama runs 36
FourierUnits per forward. This kernel keeps every intermediate in VMEM:
HBM traffic collapses to one read of x and one write of the output.

MEASURED (v5e, B=16 H=W=64 C=192, the big-lama 512² bottleneck shape):
  XLA DFT-matmul path (bf16):   2.8 ms
  this kernel, fp32 dots:       3.6 ms
  this kernel, mixed bf16/f32:  3.6 ms
XLA wins: it batches the per-image contractions into large GEMMs (full MXU
tiles) and pipelines HBM well, while Mosaic's layout rules force f32 on the
odd-minor (Wf) dots and the per-batch grid leaves the MXU at M=64. The kernel
is kept as an opt-in alternative (`FourierUnit(use_pallas_fused=True)`) and a
worked example of the layout-cycling technique; the XLA path stays default.

Implementation notes:
- grid over the batch; per-element compute is a cycle of rank-3 dot_generals
  whose free-axis rotation lands the output directly in (C', H, W) layout —
  the caller transposes NHWC↔CHW once on either side (two cheap XLA
  transposes instead of ten intermediate round-trips);
- re/im are carried as *planar* blocks [all re | all im]; the torch
  checkpoint's interleaved 1×1 conv weight and BN parameters are permuted to
  planar once on host (`_planar_params`), so the kernel needs no interleave
  shuffles;
- eval-mode only: BN (running stats) is folded into the conv weight + bias;
  training falls back to the XLA path;
- matmuls run in the requested spectral dtype (bf16 on TPU = full-rate MXU)
  with fp32 accumulation, matching the XLA DFT-matmul path's numerics.
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spectral import _dft_mats, _irdft_mats, _rdft_mats


def _planar_perm(c: int) -> np.ndarray:
    """planar index p = j*C + c  ->  interleaved index 2c + j."""
    p = np.arange(2 * c)
    j, cc = p // c, p % c
    return 2 * cc + j


def _planar_params(conv_kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold eval-mode BN into the 1×1 conv and permute interleaved→planar.
    conv_kernel: HWIO (1, 1, 2C, 2Cout). Returns (W_planar (2C, 2Cout),
    bias_planar (2Cout,))."""
    w = np.asarray(conv_kernel)[0, 0]          # (2C, 2Cout), interleaved
    scale = np.asarray(bn_scale) / np.sqrt(np.asarray(bn_var) + eps)
    bias = np.asarray(bn_bias) - np.asarray(bn_mean) * scale
    w = w * scale[None, :]
    c_in = w.shape[0] // 2
    c_out = w.shape[1] // 2
    w = w[_planar_perm(c_in)][:, _planar_perm(c_out)]
    bias = bias[_planar_perm(c_out)]
    return w.astype(np.float32), bias.astype(np.float32)


def fourier_unit_supported(h: int, w: int, c: int) -> bool:
    """VMEM envelope check: all live intermediates must fit on-chip."""
    wf = w // 2 + 1
    # rough accounting in bf16 (2 bytes): x + 4 freq planes + packed + out
    live = 2 * (h * w * c * 2 + 6 * h * wf * c + h * w * c)
    return live < 10 * 1024 * 1024 and max(h, w) <= 256


def _kernel(x_ref, wr_ref, wi_ref, hr_ref, hi_ref, ihr_ref, ihi_ref,
            cr_ref, ci_ref, wmat_ref, bias_ref, o_ref, *, c_out, dtype):
    # Mosaic lowers rank-3 dot_general only when the contraction is the minor
    # (dim 2) or middle (dim 1) axis; dim-0 contractions and unaligned
    # free-dim merges fail. The chain below therefore cycles layouts with
    # minor-pair swaps and (1,2,0) rotations — both supported — so that every
    # contraction is minor/middle.

    # Mosaic constraints shaping this kernel: matmul accumulators must be
    # 32-bit, and f32->bf16 shape-casts only lower for friendly minor dims —
    # so each dot picks its own operand dtype: bf16 (full MXU rate) where the
    # cast shape allows, f32 for the odd-minor (Wf) final dots.

    def dg(a, b, a_dim, dt):
        return jax.lax.dot_general(
            a.astype(dt), b.astype(dt),
            (((a_dim,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def rot(a):  # (A, B, C) -> (B, C, A)
        return jnp.transpose(a, (1, 2, 0))

    x = x_ref[0]                                   # (C, H, W), already `dtype`
    # W-axis real DFT: contract W (minor) -> (C, H, Wf). x arrives in `dtype`
    # (cast outside the kernel), so this dot runs at full rate with no
    # in-kernel cast.
    xr = dg(x, wr_ref[:], 2, dtype)
    xi = dg(x, wi_ref[:], 2, dtype)
    # H-axis complex DFT: swap minors -> (C, Wf, H), contract H (minor).
    # f32: the (C, Wf, H) odd-second-minor bf16 cast does not lower in Mosaic.
    xr = jnp.swapaxes(xr, 1, 2)
    xi = jnp.swapaxes(xi, 1, 2)
    yr = dg(xr, hr_ref[:], 2, jnp.float32) - dg(xi, hi_ref[:], 2, jnp.float32)
    yi = dg(xr, hi_ref[:], 2, jnp.float32) + dg(xi, hr_ref[:], 2, jnp.float32)
    # planar pack with channels minor: rotate -> (Wf, Hk, C), concat -> 2C
    z = jnp.concatenate([rot(yr), rot(yi)], axis=-1)
    # folded 1x1 conv + bias + relu: contract channels (minor) ->
    # (Wf, Hk, 2C'). This dot dominates the kernel FLOPs and its cast shape
    # (even second-minor, wide minor) is bf16-friendly -> full MXU rate.
    z = dg(z, wmat_ref[:], 2, dtype)
    z = jax.nn.relu(z + bias_ref[:].astype(z.dtype))
    ur, ui = z[..., :c_out], z[..., c_out:]
    # H-axis inverse DFT: contract Hk (middle) -> (Wf, C', H)
    vr = dg(ur, ihr_ref[:], 1, dtype) - dg(ui, ihi_ref[:], 1, dtype)
    vi = dg(ur, ihi_ref[:], 1, dtype) + dg(ui, ihr_ref[:], 1, dtype)
    # W-axis inverse real DFT: rotate -> (C', H, Wf), contract Wf (minor);
    # f32 here — the (C', H, Wf) odd-minor bf16 cast does not lower, and these
    # two dots are <10% of the kernel FLOPs
    out = dg(rot(vr), cr_ref[:], 2, jnp.float32) + \
        dg(rot(vi), ci_ref[:], 2, jnp.float32)     # (C', H, W)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_fourier_unit(x, conv_kernel, bn_scale, bn_bias, bn_mean, bn_var,
                       eps: float = 1e-5, norm: str = 'ortho',
                       dtype=jnp.bfloat16, interpret: bool = False):
    """Eval-mode FourierUnit, fully fused. x: NHWC; returns NHWC fp32.
    `interpret=True` runs the Pallas interpreter (CPU-testable)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    wf = w // 2 + 1
    c_out = conv_kernel.shape[-1] // 2

    wr, wi = _rdft_mats(w, norm)
    hr, hi = _dft_mats(h, norm)
    inv_scale = 1.0 if norm == 'ortho' else 1.0 / h
    ihr, ihi = hr.T * inv_scale, -hi.T * inv_scale
    cr, ci = _irdft_mats(w, norm)
    wmat, bias = _planar_params(conv_kernel, bn_scale, bn_bias, bn_mean, bn_var, eps)

    x_chw = jnp.transpose(x, (0, 3, 1, 2)).astype(dtype)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, c_out=c_out, dtype=dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + [vmem] * 10,
        out_specs=pl.BlockSpec((1, c_out, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_out, h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (2 * h * w * wf * c + 4 * h * wf * h * c
                           + h * wf * 4 * c * c_out + 4 * wf * h * h * c_out
                           + 2 * wf * h * w * c_out),
            bytes_accessed=b * (h * w * c + h * w * c_out) * 2,
            transcendentals=0),
    )(x_chw, jnp.asarray(wr, dtype), jnp.asarray(wi, dtype),
      jnp.asarray(hr, dtype), jnp.asarray(hi, dtype),
      jnp.asarray(ihr.astype(np.float32), dtype),
      jnp.asarray(ihi.astype(np.float32), dtype),
      jnp.asarray(cr, dtype), jnp.asarray(ci, dtype),
      jnp.asarray(wmat, dtype), jnp.asarray(bias))
    return jnp.transpose(out, (0, 2, 3, 1))
