"""2-D real FFT as MXU matmuls — the TPU-native spectral engine.

XLA's FFT custom-call on TPU runs on scalar/vector units and is the dominant
cost of the FFC global branch. For the bottleneck resolutions LaMa cares
about (H, W ≤ ~256 after 3 downsamplings), an explicit DFT as dense matmuls
runs on the 128×128 MXU instead: ~10× more FLOPs, far more than 10× the
throughput. With fp32 operands the transform is exact (same ortho
normalisation as jnp.fft.rfft2) up to fp32 rounding, preserving checkpoint
parity; with bf16 operands (dtype=jnp.bfloat16) the MXU runs at full rate
with fp32 accumulation — ~3e-3 absolute error, fine for inference.

rfft2(x)  = D_H @ (x @ R_W)     (complex column DFT after real row DFT)
irfft2(F) = Re(D_H^{-1} @ F) @ R_W^+  expressed with real matmuls.

Matrices are cached per (size, norm). Used by FourierUnit when
`use_dft_matmul` resolves to auto/True; falls back to jnp.fft for large
spatial dims where O(N²) loses to O(N log N).
"""
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _rdft_mats(n: int, norm: str) -> Tuple[np.ndarray, np.ndarray]:
    """Real-input DFT matrices: x (.., n) @ (Wr + i Wi) == rfft(x).
    Shapes (n, n//2+1)."""
    k = np.arange(n)[:, None]
    f = np.arange(n // 2 + 1)[None, :]
    ang = -2.0 * np.pi * k * f / n
    scale = 1.0 / np.sqrt(n) if norm == 'ortho' else 1.0
    return (np.cos(ang) * scale).astype(np.float32), (np.sin(ang) * scale).astype(np.float32)


@lru_cache(maxsize=64)
def _dft_mats(n: int, norm: str) -> Tuple[np.ndarray, np.ndarray]:
    """Full complex DFT matrices (n, n): X = D @ x along that axis
    (D is symmetric)."""
    k = np.arange(n)[:, None]
    f = np.arange(n)[None, :]
    ang = -2.0 * np.pi * k * f / n
    scale = 1.0 / np.sqrt(n) if norm == 'ortho' else 1.0
    return (np.cos(ang) * scale).astype(np.float32), (np.sin(ang) * scale).astype(np.float32)


@lru_cache(maxsize=64)
def _irdft_mats(n: int, norm: str) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse real DFT along W: x = Fr @ cr + Fi @ ci, with hermitian
    double-count weights for omitted negative freqs. Shapes (n//2+1, n)."""
    nf = n // 2 + 1
    f = np.arange(nf)[:, None]
    k = np.arange(n)[None, :]
    ang = 2.0 * np.pi * f * k / n
    w = np.full((nf, 1), 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    scale = 1.0 / np.sqrt(n) if norm == 'ortho' else 1.0 / n
    cr = (np.cos(ang) * w * scale).astype(np.float32)
    ci = (-np.sin(ang) * w * scale).astype(np.float32)
    return cr, ci


# Measured-quality serving lever (`store_bf16=True`, threaded from
# ServingMode.spectral_bf16_store): store DFT-matmul OUTPUTS in bf16
# instead of fp32. The spectral slice is HBM-bandwidth-bound (BASELINE.md
# rounds 3-4: shape games are noise, the fused-Pallas kernel loses), and the
# round-4 HLO audit showed the f32 DFT intermediates are 7.46 GB of the int8
# program's 20.2 GB total HBM writes — ALL of its top-level f32 fusion
# output. With bf16 operands every einsum here still ACCUMULATES in fp32 on
# the MXU; the flag only changes what is rounded when the result lands in
# HBM, halving that traffic class. MEASURED on v5e (512² b16, int8 headline
# program, probes/_t_int8_profile.py bf16_store): 85.3 -> 77.9 ms/batch
# (+9.5%, 205.3 img/s). Quality gated with TRAINED weights
# (probes/_t_int8_quality.py): hole PSNR 85.5 dB vs fp32 on center AND
# border holes — the bf16 path's own level (85.6-85.7); known pixels stay
# bit-exact. Only takes effect when the operands are already bf16 (the
# bench path); fp32 parity numerics are untouched. Serving plumbing:
# `spectral_bf16_store=true` (bin/predict.py / bin/precompile.py /
# serving.load_serving_model).


def _es(eq, a, b, dtype, store_bf16=False):
    """DFT matmul. dtype=bf16: native MXU pass (default precision). dtype=f32:
    Precision.HIGHEST — on TPU the default precision silently truncates fp32
    matmul operands to bf16, which would defeat the parity guarantee.
    CPU backend lacks bf16×bf16→f32 dots, so bf16 falls back to f32 there."""
    want_bf16 = dtype == jnp.bfloat16
    if want_bf16 and jax.default_backend() == 'cpu':
        dtype = jnp.float32  # CPU lacks bf16 dots; store_bf16 still rounds
        # the STORED result below so the quality gate is CPU-testable
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    out_dtype = jnp.bfloat16 if store_bf16 and want_bf16 else jnp.float32
    return jnp.einsum(eq, a.astype(dtype), jnp.asarray(b).astype(dtype),
                      preferred_element_type=out_dtype, precision=precision)


def _rfft2_dft_impl(x, norm, dtype, store_bf16):
    _, h, w, _ = x.shape
    wr, wi = _rdft_mats(w, norm)
    xr = _es('bhwc,wf->bhfc', x, wr, dtype, store_bf16)
    xi = _es('bhwc,wf->bhfc', x, wi, dtype, store_bf16)
    hr, hi = _dft_mats(h, norm)
    yr = (_es('bhfc,hk->bkfc', xr, hr, dtype, store_bf16)
          - _es('bhfc,hk->bkfc', xi, hi, dtype, store_bf16))
    yi = (_es('bhfc,hk->bkfc', xr, hi, dtype, store_bf16)
          + _es('bhfc,hk->bkfc', xi, hr, dtype, store_bf16))
    return yr, yi


def rfft2_dft(x, norm: str = 'ortho', dtype=jnp.float32,
              store_bf16: bool = False,
              grads_bf16: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rfft2 over axes (1, 2) of NHWC input via matmuls.
    Returns (real, imag), each (B, H, W//2+1, C) fp32 (bf16 when
    store_bf16 and the operands are bf16). grads_bf16: round the BACKWARD
    (adjoint-DFT) intermediates to bf16 at the HBM boundary too — the
    round-5 train lever (see the custom-vjp section below)."""
    if STACKED_DFT:
        return rfft2_dft_stacked(x, norm=norm, dtype=dtype)
    if PACKED_DFT:
        return rfft2_dft_packed(x, norm=norm, dtype=dtype)
    if grads_bf16:
        return _rfft2_dft_g16(x, norm, dtype, store_bf16)
    return _rfft2_dft_impl(x, norm, dtype, store_bf16)


def _irfft2_dft_impl(fr, fi, s, norm, dtype, store_bf16):
    h, w = s
    hr, hi = _dft_mats(h, norm)
    inv_scale = 1.0 if norm == 'ortho' else 1.0 / h
    ihr, ihi = hr.T * inv_scale, -hi.T * inv_scale
    xr = (_es('bkfc,kh->bhfc', fr, ihr, dtype, store_bf16)
          - _es('bkfc,kh->bhfc', fi, ihi, dtype, store_bf16))
    xi = (_es('bkfc,kh->bhfc', fr, ihi, dtype, store_bf16)
          + _es('bkfc,kh->bhfc', fi, ihr, dtype, store_bf16))
    cr, ci = _irdft_mats(w, norm)
    # x[w] = Re(sum_f X[f] e^{+i ang}) = Xr·cos − Xi·sin; ci carries the −sin
    return (_es('bhfc,fw->bhwc', xr, cr, dtype, store_bf16)
            + _es('bhfc,fw->bhwc', xi, ci, dtype, store_bf16))


def irfft2_dft(fr, fi, s: Tuple[int, int], norm: str = 'ortho',
               dtype=jnp.float32, store_bf16: bool = False,
               grads_bf16: bool = False) -> jnp.ndarray:
    """Inverse of rfft2_dft: (B, H, W//2+1, C) re/im -> (B, H, W, C) real.
    H-axis inverse uses conj(D) (D symmetric unitary for ortho)."""
    if STACKED_DFT:
        return irfft2_dft_stacked(fr, fi, s, norm=norm, dtype=dtype)
    if PACKED_DFT:
        return irfft2_dft_packed(fr, fi, s, norm=norm, dtype=dtype)
    if grads_bf16:
        return _irfft2_dft_g16(fr, fi, s, norm, dtype, store_bf16)
    return _irfft2_dft_impl(fr, fi, s, norm, dtype, store_bf16)


# ---------------------------------------------------------------------------
# bf16-stored spectral BACKWARD (round-5 train lever, VERDICT r4 item 2).
#
# The round-5 HLO audit of the fused GAN step (probes/_t_train_hlo.py,
# BASELINE.md) found 8.5 GB of the program's 53.9 GB HBM writes are
# W/H-transposed f32 spectral tensors in the G-BACKWARD — the round-4
# forward-side bf16-store lever never reaches cotangents. The DFT is linear,
# so its VJP needs no residuals: the backward is the adjoint transform,
# expressed below with the same cached matrices. With grads_bf16 the adjoint
# einsums round their outputs to bf16 at the HBM boundary exactly like the
# forward lever (MXU accumulation stays fp32); the returned cotangent is
# cast to the primal dtype (bf16 under the train compute policy).
# Numerics-changing for gradients -> gated on a 400-step training-trajectory
# comparison before shipping as a default (tests/test_spectral.py pins the
# adjoint math against jax autodiff in fp32, where it is exact).
# ---------------------------------------------------------------------------


from functools import lru_cache as _lru_cache  # noqa: E402


@_lru_cache(maxsize=None)
def _rfft2_g16_fn(norm, dtype, store_bf16, hw, in_dtype):
    # custom_vjp built per static config via closure (nondiff_argnums
    # rejects dtype classes, and residuals may not carry np.dtype objects);
    # lru_cache keeps one function object per config so jit tracing caches
    # hit. Keyed on the input (H, W)/dtype so bwd closes over them and the
    # residual stays empty (the DFT is linear — no residuals needed).
    h, w = hw

    @jax.custom_vjp
    def f(x):
        return _rfft2_dft_impl(x, norm, dtype, store_bf16)

    def fwd(x):
        return _rfft2_dft_impl(x, norm, dtype, store_bf16), None

    def bwd(_, g):
        gr, gi = g
        wr, wi = _rdft_mats(w, norm)
        hr, hi = _dft_mats(h, norm)
        gxr = (_es('bkfc,hk->bhfc', gr, hr, dtype, True)
               + _es('bkfc,hk->bhfc', gi, hi, dtype, True))
        gxi = (_es('bkfc,hk->bhfc', gi, hr, dtype, True)
               - _es('bkfc,hk->bhfc', gr, hi, dtype, True))
        gx = (_es('bhfc,wf->bhwc', gxr, wr, dtype, True)
              + _es('bhfc,wf->bhwc', gxi, wi, dtype, True))
        return (gx.astype(in_dtype),)

    f.defvjp(fwd, bwd)
    return f


def _rfft2_dft_g16(x, norm, dtype, store_bf16):
    return _rfft2_g16_fn(norm, dtype, store_bf16,
                         (x.shape[1], x.shape[2]), str(x.dtype))(x)


@_lru_cache(maxsize=None)
def _irfft2_g16_fn(s, norm, dtype, store_bf16, f_dtypes):
    h, w = s
    fr_dtype, fi_dtype = f_dtypes

    @jax.custom_vjp
    def f(fr, fi):
        return _irfft2_dft_impl(fr, fi, s, norm, dtype, store_bf16)

    def fwd(fr, fi):
        return _irfft2_dft_impl(fr, fi, s, norm, dtype, store_bf16), None

    def bwd(_, gy):
        cr, ci = _irdft_mats(w, norm)
        hr, hi = _dft_mats(h, norm)
        inv_scale = 1.0 if norm == 'ortho' else 1.0 / h
        ihr, ihi = hr.T * inv_scale, -hi.T * inv_scale
        gxr = _es('bhwc,fw->bhfc', gy, cr, dtype, True)
        gxi = _es('bhwc,fw->bhfc', gy, ci, dtype, True)
        gfr = (_es('bhfc,kh->bkfc', gxr, ihr, dtype, True)
               + _es('bhfc,kh->bkfc', gxi, ihi, dtype, True))
        gfi = (_es('bhfc,kh->bkfc', gxi, ihr, dtype, True)
               - _es('bhfc,kh->bkfc', gxr, ihi, dtype, True))
        return gfr.astype(fr_dtype), gfi.astype(fi_dtype)

    f.defvjp(fwd, bwd)
    return f


def _irfft2_dft_g16(fr, fi, s, norm, dtype, store_bf16):
    return _irfft2_g16_fn(tuple(s), norm, dtype, store_bf16,
                          (str(fr.dtype), str(fi.dtype)))(fr, fi)


def use_dft_for(h: int, w: int) -> bool:
    """Heuristic: dense DFT wins on the MXU up to ~256-point transforms."""
    return max(h, w) <= 256


# ---------------------------------------------------------------------------
# Packed-complex DFT variant.
#
# The einsums above contract K=64 and emit N∈{33,64} at LaMa's bottleneck
# (64²) — both below the 128-lane MXU tile, so each matmul runs at ≤50%
# utilisation on both dims. Packing re/im into block matrices doubles K and N
# to {66,128}: identical math (complex multiply written as one real matmul),
# 4 einsums instead of 12, full-tile shapes on the H stages. The cost is one
# explicit repack (axis-1 halves → axis-2 concat) per transform; whether the
# shape win survives XLA's concat handling is an empirical question — gated
# on PACKED_DFT and measured on-chip before becoming the default.
#
# MEASURED NEGATIVE on v5e (big-lama 512² bf16, probes/_t_bottleneck_variants
# .py): 129.6 -> 118.6 img/s alone; combined with the spectral concat layout
# 145.3 -> 133.4. The axis-repack copies between the packed matmuls cost more
# than the lane padding they remove (and XLA may re-split concat operands of
# dots). Kept off; exact + tested either way (tests/test_spectral.py).
# ---------------------------------------------------------------------------
PACKED_DFT = False


@lru_cache(maxsize=64)
def _packed_fwd_mats(h: int, w: int, norm: str):
    hr, hi = _dft_mats(h, norm)
    p1 = np.concatenate([hr, hi], axis=1)            # (h, 2h): [Hr | Hi]
    wr, wi = _rdft_mats(w, norm)
    p2 = np.block([[wr, wi], [-wi, wr]])             # (2w, 2f): cols [zr | zi]
    return p1, p2


@lru_cache(maxsize=64)
def _packed_inv_mats(h: int, w: int, norm: str):
    hr, hi = _dft_mats(h, norm)
    inv_scale = 1.0 if norm == 'ortho' else 1.0 / h
    ihr, ihi = hr.T * inv_scale, -hi.T * inv_scale
    p3 = np.block([[ihr, ihi], [-ihi, ihr]])         # (2h, 2h)
    cr, ci = _irdft_mats(w, norm)
    p4 = np.concatenate([cr, ci], axis=0)            # (2f, w)
    return p3, p4


def rfft2_dft_packed(x, norm: str = 'ortho', dtype=jnp.float32):
    """rfft2 via packed-complex matmuls: H-DFT (real in, re/im packed on the
    output axis) then W-rDFT (re/im packed on the contraction axis)."""
    _, h, w, _ = x.shape
    p1, p2 = _packed_fwd_mats(h, w, norm)
    y = _es('bhwc,hp->bpwc', x, p1, dtype)           # (b, 2h, w, c)
    y2 = jnp.concatenate([y[:, :h], y[:, h:]], axis=2)   # (b, h, 2w, c)
    z = _es('bhqc,qp->bhpc', y2, p2, dtype)          # (b, h, 2f, c)
    nf = w // 2 + 1
    return z[:, :, :nf], z[:, :, nf:]


def irfft2_dft_packed(fr, fi, s: Tuple[int, int], norm: str = 'ortho',
                      dtype=jnp.float32):
    """Inverse of rfft2_dft via packed-complex matmuls (H-inverse first)."""
    h, w = s
    p3, p4 = _packed_inv_mats(h, w, norm)
    f = jnp.concatenate([fr, fi], axis=1)            # (b, 2h, f, c)
    g = _es('bqfc,qp->bpfc', f, p3, dtype)           # (b, 2h, f, c)
    g2 = jnp.concatenate([g[:, :h], g[:, h:]], axis=2)   # (b, h, 2f, c)
    return _es('bhqc,qw->bhwc', g2, p4, dtype)       # (b, h, w, c)


# ---------------------------------------------------------------------------
# Stacked-N DFT variant (VERDICT r2 item 2).
#
# The default einsums contract K=64 and emit N∈{33,64} at LaMa's bottleneck —
# below the 128-lane MXU tile. Unlike the measured-negative PACKED_DFT (which
# paid an explicit activation repack between stages), this variant only stacks
# the CONSTANT DFT matrices along their output axis, emitting re/im as halves
# of one tensor from ONE matmul (N 33→66, 64→128); consumers take major-axis
# slices (no copies) and the re/im cross terms become one fused add.
# Einsum count per transform pair: 12 → 7.
# Gated on STACKED_DFT; exact (same math) and parity-tested either way
# (tests/test_spectral.py).
#
# MEASURED NOISE on v5e (big-lama 512² bf16 b16, probes/_t_bottleneck_
# variants3.py): 145.0 vs 145.1 img/s baseline — the DFT matmuls are not
# MXU-lane-bound (HBM-bandwidth/overlap limited), so N-widening is free but
# useless. Kept off.
# ---------------------------------------------------------------------------
STACKED_DFT = False


@lru_cache(maxsize=64)
def _stacked_fwd_mats(h: int, w: int, norm: str):
    wr, wi = _rdft_mats(w, norm)
    ws = np.concatenate([wr, wi], axis=1)            # (w, 2f): [Wr | Wi]
    hr, hi = _dft_mats(h, norm)
    hp = np.concatenate([hr, hi], axis=1)            # (h, 2h): xr coefficients
    hq = np.concatenate([-hi, hr], axis=1)           # (h, 2h): xi coefficients
    return ws, hp, hq


@lru_cache(maxsize=64)
def _stacked_inv_mats(h: int, w: int, norm: str):
    hr, hi = _dft_mats(h, norm)
    inv_scale = 1.0 if norm == 'ortho' else 1.0 / h
    ihr, ihi = hr.T * inv_scale, -hi.T * inv_scale
    hp = np.concatenate([ihr, ihi], axis=1)          # (h, 2h): fr coefficients
    hq = np.concatenate([-ihi, ihr], axis=1)         # (h, 2h): fi coefficients
    cr, ci = _irdft_mats(w, norm)
    return hp, hq, cr, ci


def rfft2_dft_stacked(x, norm: str = 'ortho', dtype=jnp.float32):
    """rfft2 with output-axis-stacked DFT matrices: W-rDFT emits [re|im] in
    one matmul; the H-DFT cross terms are two wide matmuls + one add."""
    _, h, w, _ = x.shape
    ws, hp, hq = _stacked_fwd_mats(h, w, norm)
    nf = w // 2 + 1
    y = _es('bhwc,wf->bhfc', x, ws, dtype)           # (b, h, 2f, c)
    xr, xi = y[:, :, :nf], y[:, :, nf:]
    t = (_es('bhfc,hp->bpfc', xr, hp, dtype)
         + _es('bhfc,hp->bpfc', xi, hq, dtype))      # (b, 2h, f, c): [yr | yi]
    return t[:, :h], t[:, h:]


def irfft2_dft_stacked(fr, fi, s: Tuple[int, int], norm: str = 'ortho',
                       dtype=jnp.float32):
    """Inverse of rfft2_dft with a stacked H-inverse stage."""
    h, w = s
    hp, hq, cr, ci = _stacked_inv_mats(h, w, norm)
    t = (_es('bkfc,kp->bpfc', fr, hp, dtype)
         + _es('bkfc,kp->bpfc', fi, hq, dtype))      # (b, 2h, f, c): [xr | xi]
    xr, xi = t[:, :h], t[:, h:]
    return (_es('bhfc,fw->bhwc', xr, cr, dtype)
            + _es('bhfc,fw->bhwc', xi, ci, dtype))
