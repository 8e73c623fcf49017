"""Fast Fourier Convolution generator family — TPU-native re-design.

Re-implements the behaviour of the reference FFC stack
(saicinpainting/training/modules/ffc.py) as flax.linen modules over NHWC
tensors, structured so that the whole generator forward is one XLA program:

- `FourierUnit`   — rfft2 → interleaved re/im channels → 1×1 conv (MXU matmul)
                    + BN + ReLU → irfft2 (reference ffc.py:49-113)
- `SpectralTransform` — 1×1 down-project, FourierUnit, optional LFU on 2×2
                    spatial splits, residual, 1×1 up-project (ffc.py:116-163)
- `FFC`           — two-stream local/global conv with l2l/l2g/g2l/g2g paths
                    (ffc.py:166-225); the global stream is `None` when absent
                    (torch uses the int 0)
- `FFC_BN_ACT`, `FFCResnetBlock`, `ConcatTupleLayer` (ffc.py:228-302)
- `FFCResNetGenerator` (ffc.py:305-367), `FFCNLayerDiscriminator` (ffc.py:370-433)

Naming mirrors the torch module tree (model_<i> for sequential entries with
parameters, conv1_0/conv1_1 for Sequential members) so the checkpoint
converter is a mechanical key rename + kernel transpose.

Numerics: spectral path runs in fp32/complex64 regardless of the module compute
dtype (bf16 FFT accumulation is the classic parity killer — SURVEY §7 hard part
No. 1); spatial convs run in the configured dtype.
"""
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import get_activation
from ..ops.conv import Conv2d, ConvTranspose2d, avg_pool2d
from ..ops.conv import conv2d as fconv2d
from ..ops.geometry import rotate
from ..ops.norm import BatchNorm, PermutedBatchNorm
from ..ops.serving_mode import DEFAULT as DEFAULT_MODE, ServingMode
from ..ops.pad import pad2d, reflection_pad2d
from ..ops.resize import interpolate

Dtype = Any

# merge convl2l+convl2g (shared input) into one wider conv at apply time.
# MEASURED NOISE on v5e (big-lama 512² bf16: 130.2 vs 129.6 img/s baseline,
# probes/_t_bottleneck_variants.py) — XLA already runs the separate convs at
# the same speed. Kept off; exact either way (tests/test_spectral.py).
MERGE_SIBLING_CONVS = False

# FourierUnit eval path: keep re/im as contiguous channel halves
# ([re_0..re_C, im_0..im_C]) instead of the reference's per-channel
# interleave ([re_0, im_0, re_1, ...]). The interleave is a lane-hostile
# (..., C, 2)->2C shuffle on TPU; the halves layout is a plain concat. Exact:
# the 1x1 spectral conv kernel and BN params are permuted to match at apply
# time (tests/test_spectral.py). MEASURED +12% on v5e (big-lama 512² bf16:
# 129.6 -> 145.3 img/s, probes/_t_bottleneck_variants.py) — default ON.
SPECTRAL_CONCAT_LAYOUT = True

# Eval-only: fold spectral BN (running stats) into the 1×1 frequency conv
# kernel + bias (VERDICT r2 item 2 suggestion). Exact up to bf16 kernel
# rounding in the bf16 bench path; fp32 path unchanged numerics. Gated for
# on-chip measurement (round-1's generator-wide BN pre-fold was a measured
# NEGATIVE — this narrower version touches only the 36 spectral BNs).
SPECTRAL_FOLD_BN = False

# PROBE ONLY (semantics-changing): replace the FourierUnit's spectral compute
# with identity — the TIMING upper bound for the whole spectral slice of the
# serving program (round-4 int8 attribution, probes/_t_int8_profile.py).
# Never wire into a product path.
SPECTRAL_SKIP = False

# Round-4 measured-quality lever: when serving int8 (ServingMode.int8), run the
# frequency-domain 1×1 conv through the int8 MXU path (per-tensor dynamic
# activation scale over the frequency tensor, per-output-channel weight
# scales). The spectrum is DC-dominated, so the per-tensor scale costs
# high-frequency precision — gate any default flip on trained-weight
# hole-PSNR staying at the bf16 path's own ~88 dB level
# (probes/_t_int8_quality.py methodology). Default OFF.
SPECTRAL_INT8 = False

# Stream = Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]  # (local, global)


def _as_streams(x):
    if isinstance(x, tuple):
        return x
    return (x, None)


class SELayer(nn.Module):
    """Squeeze-excitation gating (reference squeeze_excitation.py:4-20)."""
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.Dense(c // self.reduction, use_bias=False, name='fc_0',
                     dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = jax.nn.relu(y)
        y = nn.Dense(c, use_bias=False, name='fc_2',
                     dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class FFCSE_block(nn.Module):
    """Squeeze-excitation over the concatenated (local, global) streams with
    separate gate projections back to each stream (reference ffc.py:16-46)."""
    channels: int
    ratio_g: float
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = x if isinstance(x, tuple) else (x, None)
        id_l, id_g = x
        in_cg = int(self.channels * self.ratio_g)
        in_cl = self.channels - in_cg
        r = 16

        joined = id_l if id_g is None else jnp.concatenate([id_l, id_g], axis=-1)
        y = jnp.mean(joined, axis=(1, 2), keepdims=True)
        y = Conv2d(self.channels // r, kernel_size=1, name='conv1',
                   mode=self.mode, dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        x_l = None if in_cl == 0 else id_l * jax.nn.sigmoid(
            Conv2d(in_cl, kernel_size=1, name='conv_a2l', mode=self.mode,
                   dtype=self.dtype)(y))
        x_g = None if in_cg == 0 else id_g * jax.nn.sigmoid(
            Conv2d(in_cg, kernel_size=1, name='conv_a2g', mode=self.mode,
                   dtype=self.dtype)(y))
        return x_l, x_g


class FourierUnit(nn.Module):
    """Spectral core: rfft2 → 1×1 conv + BN + ReLU in frequency domain → irfft2.

    Channel packing matches the reference exactly (ffc.py:87-89): after the
    FFT, real/imag parts are interleaved per source channel
    ([c0_re, c0_im, c1_re, c1_im, ...]), the 1×1 conv mixes 2C→2C_out, and the
    output is unpacked back to complex. `fft_norm='ortho'` default.
    """
    features: int  # output complex channels
    groups: int = 1  # grouped 1x1 spectral conv (reference ffc.py conv_layer groups)
    spatial_scale_factor: Optional[float] = None
    spatial_scale_mode: str = 'bilinear'
    spectral_pos_encoding: bool = False
    use_se: bool = False
    ffc3d: bool = False  # 3-D FFT over (C, H, W) — reference ffc.py:85,106-107
    fft_norm: str = 'ortho'
    use_dft_matmul: Optional[bool] = None  # None = auto (MXU DFT for small dims)
    # opt-in fully-fused Pallas kernel for the eval path (measured slower than
    # the XLA DFT-matmul path on v5e — see ops/pallas/fourier_unit.py)
    use_pallas_fused: bool = False
    # DFT matmul operand dtype; None = follow the module compute dtype policy:
    # bf16 compute -> bf16 spectral (full-rate MXU), otherwise fp32 with
    # Precision.HIGHEST (exact parity vs jnp.fft)
    spectral_dtype: Optional[Dtype] = None
    # Round-5 train lever (HLO audit, BASELINE.md): round the spectral
    # BACKWARD intermediates (adjoint-DFT cotangents) to bf16 at the HBM
    # boundary, and store the forward DFT outputs bf16 in train mode so the
    # whole cotangent chain stays bf16. Thread via
    # generator `spectral_kwargs={'spectral_bf16_grads': True}`. Only active
    # under the bf16 compute policy; fp32 parity numerics untouched.
    spectral_bf16_grads: bool = False
    mode: ServingMode = DEFAULT_MODE
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    def _spectral_dtype(self):
        if self.spectral_dtype is not None:
            return self.spectral_dtype
        return jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.spectral import irfft2_dft, rfft2_dft, use_dft_for

        orig_dtype = x.dtype
        # round-5 train lever (attr doc): bf16 fwd stores + bf16 adjoint
        # stores for every DFT in this unit when training under bf16 compute
        gb16 = (self.spectral_bf16_grads and train
                and self._spectral_dtype() == jnp.bfloat16)
        if SPECTRAL_SKIP and self.has_variable('params', 'conv_layer'):
            # probe-only identity (params already exist, so checkpoints/init
            # are unaffected); data-dependent so XLA cannot constant-fold the
            # downstream convs away — an honest spectral-removal upper bound
            return x[..., :self.features].astype(orig_dtype)
        if self.spatial_scale_factor is not None:
            orig_size = x.shape[1:3]
            x = interpolate(x, scale_factor=self.spatial_scale_factor,
                            mode=self.spatial_scale_mode, align_corners=False)

        b, h, w, c = x.shape
        if (self.use_pallas_fused and not train and not self.spectral_pos_encoding
                and not self.use_se and self.groups == 1 and not self.ffc3d
                and self.has_variable('params', 'conv_layer')):
            # opt-in fused kernel: reuses the SAME parameters the XLA path
            # creates ('conv_layer'/'bn'); at init the variables don't exist
            # yet, so initialisation always flows through the XLA path below.
            from ..ops.pallas.fourier_unit import fused_fourier_unit
            conv_kernel = self.get_variable('params', 'conv_layer')['kernel']
            bn_p = self.get_variable('params', 'bn')
            bn_s = self.get_variable('batch_stats', 'bn')
            out = fused_fourier_unit(x, conv_kernel, bn_p['scale'], bn_p['bias'],
                                     bn_s['mean'], bn_s['var'],
                                     norm=self.fft_norm,
                                     dtype=self._spectral_dtype())
            return out.astype(orig_dtype)
        if self.ffc3d:
            # torch.fft.rfftn(x, dim=(-3, -2, -1)) over NCHW = full FFT over
            # (C, H), real FFT over W; NHWC axes (3, 1, 2) keep W the real
            # axis, so the frequency tensor stays (B, H, W2, C) and the
            # interleave packing below is unchanged (reference ffc.py:85-89).
            dft = False
            fft = jnp.fft.rfftn(x.astype(jnp.float32), axes=(3, 1, 2),
                                norm=self.fft_norm)
            f_re, f_im = fft.real, fft.imag
        else:
            dft = self.use_dft_matmul if self.use_dft_matmul is not None else use_dft_for(h, w)
            if dft:
                f_re, f_im = rfft2_dft(x, norm=self.fft_norm,
                                       dtype=self._spectral_dtype(),
                                       store_bf16=(self.mode.spectral_bf16_store
                                                   or gb16),
                                       grads_bf16=gb16)
            else:
                fft = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm=self.fft_norm)
                f_re, f_im = fft.real, fft.imag
        w2 = f_re.shape[2]
        if (SPECTRAL_CONCAT_LAYOUT and dft
                and not self.spectral_pos_encoding and not self.use_se
                and self.groups == 1
                and self.has_variable('params', 'conv_layer')):
            import numpy as _np
            cdt = self._spectral_dtype()
            cout = self.features
            kern = self.get_variable('params', 'conv_layer')['kernel']
            perm_in = _np.concatenate([_np.arange(c) * 2, _np.arange(c) * 2 + 1])
            perm_out = _np.concatenate([_np.arange(cout) * 2,
                                        _np.arange(cout) * 2 + 1])
            kern = kern[:, :, perm_in][:, :, :, perm_out]
            y = jnp.concatenate([f_re, f_im], axis=-1).astype(cdt)
            if SPECTRAL_FOLD_BN and not train:
                # eval: fold BN (running stats) into the 1×1 kernel + a bias
                # add — the BN op disappears from the activation path
                bn_p = self.get_variable('params', 'bn')
                bn_s = self.get_variable('batch_stats', 'bn')
                mult = (bn_p['scale'][perm_out]
                        * jax.lax.rsqrt(bn_s['var'][perm_out] + 1e-5))
                shift = (bn_p['bias'][perm_out]
                         - bn_s['mean'][perm_out] * mult)
                y = jax.lax.conv_general_dilated(
                    y, (kern * mult[None, None, None, :]).astype(cdt), (1, 1),
                    'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                y = y.astype(jnp.float32) + shift[None, None, None, :]
            else:
                from ..ops import quant as _quant
                if SPECTRAL_INT8 and self.mode.int8 and not train:
                    # measured-quality lever (flag doc above): int8 MXU conv
                    # over the frequency tensor — halves the conv's HBM reads
                    # on the HBM-bound spectral slice (BASELINE.md round 3)
                    y = _quant.quantized_conv2d(y, kern.astype(jnp.float32),
                                                stride=1, padding=0,
                                                out_dtype=cdt)
                else:
                    y = jax.lax.conv_general_dilated(
                        y, kern.astype(cdt), (1, 1), 'VALID',
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                # BN params/stats stay stored in the reference's interleaved
                # order; PermutedBatchNorm gathers reads / scatters stat writes
                # (channel-vector permutes — free next to the tensor shuffle
                # this branch removes), so train mode works here too.
                y = PermutedBatchNorm(perm=tuple(perm_out), name='bn',
                                      axis_name=self.bn_axis_name)(
                    y, use_running_average=not train)
            y = jax.nn.relu(y)
            out = irfft2_dft(y[..., :cout], y[..., cout:], s=(h, w),
                             norm=self.fft_norm, dtype=cdt,
                             store_bf16=(self.mode.spectral_bf16_store
                                         or gb16),
                             grads_bf16=gb16)
            if self.spatial_scale_factor is not None:
                out = interpolate(out, size=orig_size,
                                  mode=self.spatial_scale_mode,
                                  align_corners=False)
            return out.astype(orig_dtype)
        # interleave re/im per channel: (B, H, W2, C, 2) -> (B, H, W2, 2C)
        y = jnp.stack([f_re, f_im], axis=-1).reshape(b, h, w2, 2 * c)

        if self.spectral_pos_encoding:
            coords_v = jnp.broadcast_to(jnp.linspace(0, 1, h)[None, :, None, None], (b, h, w2, 1))
            coords_h = jnp.broadcast_to(jnp.linspace(0, 1, w2)[None, None, :, None], (b, h, w2, 1))
            y = jnp.concatenate([coords_v.astype(y.dtype), coords_h.astype(y.dtype), y], axis=-1)

        if self.use_se:
            y = SELayer(name='se', dtype=jnp.float32)(y)

        # quantize=False: the spectral path stays out of int8 serving — the
        # frequency tensor's DC-dominated dynamic range is hostile to a
        # per-tensor activation scale (and fp32/bf16 spectral is a repo
        # invariant, CLAUDE.md)
        y = Conv2d(2 * self.features, kernel_size=1, groups=self.groups,
                   use_bias=False, name='conv_layer', quantize=False,
                   dtype=self._spectral_dtype())(y)
        y = BatchNorm(name='bn', axis_name=self.bn_axis_name)(y, use_running_average=not train)
        y = jax.nn.relu(y)

        y = y.reshape(b, h, w2, self.features, 2)
        if self.ffc3d:
            # s mirrors the reference's `x.shape[-3:]` (INPUT channel count;
            # in every FourierUnit call site features == c) — ffc.py:106-107
            fft_out = jax.lax.complex(y[..., 0], y[..., 1])
            out = jnp.fft.irfftn(fft_out, s=(c, h, w), axes=(3, 1, 2),
                                 norm=self.fft_norm)
        elif dft:
            out = irfft2_dft(y[..., 0], y[..., 1], s=(h, w), norm=self.fft_norm,
                             dtype=self._spectral_dtype(),
                             store_bf16=(self.mode.spectral_bf16_store
                                         or gb16),
                             grads_bf16=gb16)
        else:
            fft_out = jax.lax.complex(y[..., 0], y[..., 1])
            out = jnp.fft.irfft2(fft_out, s=(h, w), axes=(1, 2), norm=self.fft_norm)

        if self.spatial_scale_factor is not None:
            out = interpolate(out, size=orig_size, mode=self.spatial_scale_mode,
                              align_corners=False)
        return out.astype(orig_dtype)


class SpectralTransform(nn.Module):
    """Reference ffc.py:116-163. Sequential `conv1` unrolled as conv1_0/conv1_1."""
    features: int
    stride: int = 1
    groups: int = 1
    enable_lfu: bool = True
    mode: ServingMode = DEFAULT_MODE
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None
    fu_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 2:
            x = avg_pool2d(x, 2, 2)
        half = self.features // 2
        x = Conv2d(half, kernel_size=1, groups=self.groups, use_bias=False,
                   name='conv1_0', mode=self.mode, dtype=self.dtype)(x)
        x = BatchNorm(name='conv1_1', axis_name=self.bn_axis_name)(x, use_running_average=not train)
        x = jax.nn.relu(x)

        fu_kwargs = dict(self.fu_kwargs or {})
        output = FourierUnit(half, groups=self.groups, name='fu',
                             mode=self.mode, bn_axis_name=self.bn_axis_name,
                             dtype=self.dtype, **fu_kwargs)(x, train=train)

        if self.enable_lfu:
            _, h, w, c = x.shape
            split_s = h // 2
            # 2×2 spatial tiling folded into channels (ffc.py:149-157)
            xs = jnp.concatenate(jnp.split(x[..., :c // 4], 2, axis=1), axis=-1)
            xs = jnp.concatenate(jnp.split(xs, 2, axis=2), axis=-1)
            xs = FourierUnit(half, groups=self.groups, name='lfu',
                             mode=self.mode, bn_axis_name=self.bn_axis_name,
                             dtype=self.dtype)(xs, train=train)
            xs = jnp.tile(xs, (1, 2, 2, 1))
        else:
            xs = 0

        out = Conv2d(self.features, kernel_size=1, groups=self.groups, use_bias=False,
                     name='conv2', mode=self.mode, dtype=self.dtype)(x + output + xs)
        return out


class FFC(nn.Module):
    """Two-stream (local, global) convolution (reference ffc.py:166-225)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    enable_lfu: bool = True
    padding_type: str = 'reflect'
    gated: bool = False
    mode: ServingMode = DEFAULT_MODE
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None
    spectral_kwargs: Optional[dict] = None

    @property
    def global_in_num(self):
        return int(self.in_channels * self.ratio_gin)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_l, x_g = _as_streams(x)
        in_cg = int(self.in_channels * self.ratio_gin)
        in_cl = self.in_channels - in_cg
        out_cg = int(self.out_channels * self.ratio_gout)
        out_cl = self.out_channels - out_cg

        conv_kw = dict(kernel_size=self.kernel_size, stride=self.stride,
                       padding=self.padding, dilation=self.dilation,
                       groups=self.groups, use_bias=self.use_bias,
                       padding_mode=self.padding_type, mode=self.mode,
                       dtype=self.dtype)

        if self.gated:
            parts = [x_l] if x_l is not None else []
            if x_g is not None:
                parts.append(x_g)
            total_input = jnp.concatenate(parts, axis=-1)
            gates = jax.nn.sigmoid(Conv2d(2, kernel_size=1, name='gate',
                                          mode=self.mode,
                                          dtype=self.dtype)(total_input))
            g2l_gate, l2g_gate = gates[..., 0:1], gates[..., 1:2]
        else:
            g2l_gate, l2g_gate = 1.0, 1.0

        # sibling-conv merge: convl2l and convl2g share input x_l (and pad /
        # stride / dilation); concatenating their kernels along the output
        # axis at apply time runs them as ONE conv with a wider N dim — same
        # FLOPs, fewer kernels, bigger MXU tiles. Exact (conv is linear in the
        # kernel's output axis); params/checkpoints unchanged (the normal path
        # below declares them at init).
        l2l_out = l2g_out = None
        if (MERGE_SIBLING_CONVS and not self.gated and self.groups == 1
                and in_cl > 0 and x_l is not None and out_cl > 0 and out_cg > 0
                and self.has_variable('params', 'convl2l')
                and self.has_variable('params', 'convl2g')):
            p_ll = self.get_variable('params', 'convl2l')
            p_lg = self.get_variable('params', 'convl2g')
            mdtype = self.dtype or x_l.dtype
            mk = jnp.concatenate([p_ll['kernel'], p_lg['kernel']],
                                 axis=3).astype(mdtype)
            mb = (jnp.concatenate([p_ll['bias'], p_lg['bias']]).astype(mdtype)
                  if self.use_bias else None)
            merged = fconv2d(x_l.astype(mdtype), mk, bias=mb,
                             stride=self.stride, padding=self.padding,
                             dilation=self.dilation, groups=1,
                             padding_mode=self.padding_type)
            l2l_out, l2g_out = merged[..., :out_cl], merged[..., out_cl:]

        out_xl, out_xg = None, None
        if out_cl > 0:
            acc = None
            if in_cl > 0 and x_l is not None:
                acc = (l2l_out if l2l_out is not None
                       else Conv2d(out_cl, name='convl2l', **conv_kw)(x_l))
            if in_cg > 0 and x_g is not None:
                term = Conv2d(out_cl, name='convg2l', **conv_kw)(x_g) * g2l_gate
                acc = term if acc is None else acc + term
            out_xl = acc
        if out_cg > 0:
            acc = None
            if in_cl > 0 and x_l is not None:
                acc = (l2g_out if l2g_out is not None
                       else Conv2d(out_cg, name='convl2g', **conv_kw)(x_l)) * l2g_gate
            if in_cg > 0 and x_g is not None:
                term = SpectralTransform(
                    out_cg, stride=self.stride,
                    groups=1 if self.groups == 1 else self.groups // 2,
                    enable_lfu=self.enable_lfu, name='convg2g',
                    mode=self.mode, bn_axis_name=self.bn_axis_name,
                    dtype=self.dtype,
                    fu_kwargs=self.spectral_kwargs)(x_g, train=train)
                acc = term if acc is None else acc + term
            out_xg = acc

        return out_xl, out_xg


class FFC_BN_ACT(nn.Module):
    """FFC + per-stream BatchNorm + activation (reference ffc.py:228-255)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    activation: Any = 'identity'   # 'relu' | 'leaky_relu' | callable | 'identity'
    padding_type: str = 'reflect'
    enable_lfu: bool = True
    gated: bool = False
    mode: ServingMode = DEFAULT_MODE
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None
    spectral_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        x_l, x_g = FFC(self.in_channels, self.out_channels, self.kernel_size,
                       self.ratio_gin, self.ratio_gout, stride=self.stride,
                       padding=self.padding, dilation=self.dilation,
                       groups=self.groups, use_bias=self.use_bias,
                       enable_lfu=self.enable_lfu, padding_type=self.padding_type,
                       gated=self.gated, name='ffc', mode=self.mode,
                       bn_axis_name=self.bn_axis_name,
                       dtype=self.dtype, spectral_kwargs=self.spectral_kwargs)(x, train=train)
        if x_l is not None:
            x_l = BatchNorm(name='bn_l', axis_name=self.bn_axis_name)(x_l, use_running_average=not train)
            x_l = act(x_l)
        if x_g is not None:
            x_g = BatchNorm(name='bn_g', axis_name=self.bn_axis_name)(x_g, use_running_average=not train)
            x_g = act(x_g)
        return x_l, x_g


class LearnableSpatialTransformWrapper(nn.Module):
    """Reflect-pad 50%, rotate by a learnable angle, apply inner module, rotate
    back, unpad (reference spatial_transform.py:7-41). Angle initialised
    uniform [0, angle_init_range)."""
    inner: nn.Module
    pad_coef: float = 0.5
    angle_init_range: float = 80.0
    train_angle: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        angle = self.param('angle',
                           lambda key: jax.random.uniform(key, (1,)) * self.angle_init_range)
        if not self.train_angle:
            angle = jax.lax.stop_gradient(angle)
        angle = angle[0]

        def transform(t):
            h, w = t.shape[1:3]
            ph, pw = int(h * self.pad_coef), int(w * self.pad_coef)
            return rotate(pad2d(t, ((ph, ph), (pw, pw)), mode='reflect'), angle)

        def inverse(t, orig):
            h, w = orig.shape[1:3]
            ph, pw = int(h * self.pad_coef), int(w * self.pad_coef)
            t = rotate(t, -angle)
            return t[:, ph:t.shape[1] - ph, pw:t.shape[2] - pw]

        if isinstance(x, tuple):
            x_trans = tuple(None if e is None else transform(e) for e in x)
            y_trans = self.inner(x_trans, train=train)
            return tuple(None if e is None else inverse(e, o)
                         for e, o in zip(y_trans, x))
        return inverse(self.inner(transform(x), train=train), x)


class FFCResnetBlock(nn.Module):
    """Two FFC_BN_ACT 3×3 with residual on both streams (reference ffc.py:258-292)."""
    dim: int
    padding_type: str = 'reflect'
    activation: Any = 'relu'
    dilation: int = 1
    ratio_gin: float = 0.75
    ratio_gout: float = 0.75
    enable_lfu: bool = True
    inline: bool = False
    spatial_transform_kwargs: Optional[dict] = None
    mode: ServingMode = DEFAULT_MODE
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None
    spectral_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        global_in_num = int(self.dim * self.ratio_gin)
        if self.inline:
            x_l, x_g = x[..., :-global_in_num], x[..., -global_in_num:]
        else:
            x_l, x_g = _as_streams(x)

        id_l, id_g = x_l, x_g
        conv_kw = dict(in_channels=self.dim, out_channels=self.dim, kernel_size=3,
                       padding=self.dilation, dilation=self.dilation,
                       ratio_gin=self.ratio_gin, ratio_gout=self.ratio_gout,
                       activation=self.activation, padding_type=self.padding_type,
                       enable_lfu=self.enable_lfu, mode=self.mode,
                       bn_axis_name=self.bn_axis_name,
                       dtype=self.dtype, spectral_kwargs=self.spectral_kwargs)
        conv1 = FFC_BN_ACT(name='conv1', **conv_kw)
        conv2 = FFC_BN_ACT(name='conv2', **conv_kw)
        if self.spatial_transform_kwargs is not None:
            conv1 = LearnableSpatialTransformWrapper(conv1, name='conv1_st',
                                                     **self.spatial_transform_kwargs)
            conv2 = LearnableSpatialTransformWrapper(conv2, name='conv2_st',
                                                     **self.spatial_transform_kwargs)

        x_l, x_g = conv1((x_l, x_g), train=train)
        x_l, x_g = conv2((x_l, x_g), train=train)
        x_l = id_l + x_l if (id_l is not None and x_l is not None) else (x_l if id_l is None else id_l)
        x_g = id_g + x_g if (id_g is not None and x_g is not None) else (x_g if id_g is None else id_g)
        if self.inline:
            return jnp.concatenate([x_l, x_g], axis=-1)
        return x_l, x_g


def concat_tuple(x):
    """ConcatTupleLayer (reference ffc.py:295-302)."""
    if not isinstance(x, tuple):
        return x
    x_l, x_g = x
    if x_g is None:
        return x_l
    if x_l is None:
        return x_g
    return jnp.concatenate([x_l, x_g], axis=-1)


class FFCResNetGenerator(nn.Module):
    """THE LaMa generator (reference ffc.py:305-367), NHWC.

    Sequential entries with parameters are named model_<torch index> so the
    torch `generator.model.N.*` key-space converts mechanically.
    big-lama: input_nc=4, ngf=64, n_downsampling=3, n_blocks=18,
    resnet ratio 0.75, add_out_act='sigmoid' (configs/training/big-lama.yaml).
    """
    input_nc: int = 4
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 18
    padding_type: str = 'reflect'
    activation: Any = 'relu'
    up_activation: Any = 'relu'
    init_conv_kwargs: Optional[dict] = None
    downsample_conv_kwargs: Optional[dict] = None
    resnet_conv_kwargs: Optional[dict] = None
    spatial_transform_layers: Optional[Sequence[int]] = None
    spatial_transform_kwargs: Optional[dict] = None
    add_out_act: Any = True
    max_features: int = 1024
    out_ffc: bool = False
    out_ffc_kwargs: Optional[dict] = None
    spectral_kwargs: Optional[dict] = None  # forwarded to every FourierUnit
    # jax.checkpoint each bottleneck block: backward recomputes the block
    # forward instead of loading saved residuals — trades HBM writes (the
    # train step is write-saturated, BASELINE.md HLO audit) and memory for
    # recompute FLOPs. Numerics-identical (tests/test_ffc.py); train-time
    # only lever, off by default pending an on-chip measurement.
    remat_blocks: bool = False
    # static serving configuration (ops/serving_mode.py), threaded to every
    # conv / spectral op in the tree — replaces the round-4 process-global
    # serving flags (VERDICT r4 weak #5)
    mode: ServingMode = DEFAULT_MODE
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, stage: str = 'full'):
        """stage: 'full' | 'front' (pad+init+downsamples -> stream tuple) |
        'rear' (stream tuple -> image). The front/rear split point is the
        first resnet block — the same split the reference refiner uses
        (evaluation/refinement.py:267-289); parameter names are identical
        across stages, so one `init`/checkpoint serves all three."""
        assert stage in ('full', 'front', 'rear'), stage
        init_kw = dict(self.init_conv_kwargs or {})
        down_kw = dict(self.downsample_conv_kwargs or {})
        resnet_kw = dict(self.resnet_conv_kwargs or {})
        common = dict(mode=self.mode, bn_axis_name=self.bn_axis_name,
                      dtype=self.dtype, spectral_kwargs=self.spectral_kwargs)

        idx = 2
        if stage in ('full', 'front'):
            # --- index 0: ReflectionPad(3); index 1: 7×7 init FFC_BN_ACT.
            # the pad is folded into the conv (padding=3 + reflect mode) so it
            # takes the decomposed fast path instead of a full-tensor copy
            x = FFC_BN_ACT(self.input_nc, self.ngf, kernel_size=7, padding=3,
                           ratio_gin=init_kw.get('ratio_gin', 0),
                           ratio_gout=init_kw.get('ratio_gout', 0),
                           enable_lfu=init_kw.get('enable_lfu', True),
                           activation=self.activation, name='model_1', **common)(x, train=train)

            # --- downsampling: indices 2 .. 1+n_downsampling
            for i in range(self.n_downsampling):
                mult = 2 ** i
                ratio_gin = down_kw.get('ratio_gin', 0)
                if i == self.n_downsampling - 1:
                    ratio_gout = resnet_kw.get('ratio_gin', 0)
                else:
                    ratio_gout = down_kw.get('ratio_gout', 0)
                x = FFC_BN_ACT(min(self.max_features, self.ngf * mult),
                               min(self.max_features, self.ngf * mult * 2),
                               kernel_size=3, stride=2, padding=1,
                               ratio_gin=ratio_gin, ratio_gout=ratio_gout,
                               enable_lfu=down_kw.get('enable_lfu', True),
                               activation=self.activation,
                               name=f'model_{idx}', **common)(x, train=train)
                idx += 1
            if stage == 'front':
                return x
        else:
            idx += self.n_downsampling

        # --- bottleneck resnet blocks
        mult = 2 ** self.n_downsampling
        feats = min(self.max_features, self.ngf * mult)
        for i in range(self.n_blocks):
            st_kwargs = None
            if self.spatial_transform_layers is not None and i in self.spatial_transform_layers:
                st_kwargs = dict(self.spatial_transform_kwargs or {})
            # remat only the plain-block case (spatial-transform wrappers call
            # the inner module with keyword args, incompatible with the lifted
            # transform's positional static_argnums)
            use_remat = self.remat_blocks and st_kwargs is None
            block_cls = (nn.remat(FFCResnetBlock, static_argnums=(2,))
                         if use_remat else FFCResnetBlock)
            block = block_cls(feats, padding_type=self.padding_type,
                              activation=self.activation,
                              ratio_gin=resnet_kw.get('ratio_gin', 0.75),
                              ratio_gout=resnet_kw.get('ratio_gout', 0.75),
                              enable_lfu=resnet_kw.get('enable_lfu', True),
                              name=f'model_{idx}', **common)
            if st_kwargs is not None:
                block = LearnableSpatialTransformWrapper(block, name=f'model_{idx}_st', **st_kwargs)
            x = block(x, train) if use_remat else block(x, train=train)
            idx += 1

        # --- ConcatTupleLayer (no params)
        x = concat_tuple(x)
        idx += 1

        # --- upsampling: ConvT + BN + act triplets
        up_act = get_activation(self.up_activation)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x = ConvTranspose2d(min(self.max_features, int(self.ngf * mult / 2)),
                                kernel_size=3, stride=2, padding=1, output_padding=1,
                                name=f'model_{idx}', mode=self.mode,
                                dtype=self.dtype)(x)
            x = BatchNorm(name=f'model_{idx + 1}',
                          axis_name=self.bn_axis_name)(x, use_running_average=not train)
            x = up_act(x)
            idx += 3

        if self.out_ffc:
            out_kw = dict(self.out_ffc_kwargs or {})
            x = FFCResnetBlock(self.ngf, padding_type=self.padding_type,
                               activation=self.activation, inline=True,
                               ratio_gin=out_kw.get('ratio_gin', 0.75),
                               ratio_gout=out_kw.get('ratio_gout', 0.75),
                               enable_lfu=out_kw.get('enable_lfu', True),
                               name=f'model_{idx}', **common)(x, train=train)
            idx += 1

        # --- final ReflectionPad(3) + 7×7 conv (+ out activation), pad folded
        idx += 1
        x = Conv2d(self.output_nc, kernel_size=7, padding=3, padding_mode='reflect',
                   name=f'model_{idx}', mode=self.mode, dtype=self.dtype)(x)
        if self.add_out_act:
            out_act = get_activation('tanh' if self.add_out_act is True else self.add_out_act)
            x = out_act(x.astype(jnp.float32))
        return x


class FFCNLayerDiscriminator(nn.Module):
    """FFC PatchGAN discriminator (reference ffc.py:370-433). Returns
    (score_map, feature list) for feature matching."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    max_features: int = 512
    init_conv_kwargs: Optional[dict] = None
    conv_kwargs: Optional[dict] = None
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_kw = dict(self.init_conv_kwargs or {})
        conv_kw = dict(self.conv_kwargs or {})
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        kw, padw = 3, 1
        feats = []

        def record(t):
            feats.append(concat_tuple(t) if isinstance(t, tuple) else t)

        h = FFC_BN_ACT(self.input_nc, self.ndf, kernel_size=kw, padding=padw,
                       ratio_gin=init_kw.get('ratio_gin', 0),
                       ratio_gout=init_kw.get('ratio_gout', 0),
                       enable_lfu=init_kw.get('enable_lfu', True),
                       activation='leaky_relu', name='model0_0', **common)(x, train=train)
        record(h)

        nf = self.ndf
        for n in range(1, self.n_layers):
            nf_prev, nf = nf, min(nf * 2, self.max_features)
            h = FFC_BN_ACT(nf_prev, nf, kernel_size=kw, stride=2, padding=padw,
                           ratio_gin=conv_kw.get('ratio_gin', 0),
                           ratio_gout=conv_kw.get('ratio_gout', 0),
                           enable_lfu=conv_kw.get('enable_lfu', True),
                           activation='leaky_relu',
                           name=f'model{n}_0', **common)(h, train=train)
            record(h)

        nf_prev, nf = nf, min(nf * 2, 512)
        h = FFC_BN_ACT(nf_prev, nf, kernel_size=kw, stride=1, padding=padw,
                       ratio_gin=conv_kw.get('ratio_gin', 0),
                       ratio_gout=conv_kw.get('ratio_gout', 0),
                       enable_lfu=conv_kw.get('enable_lfu', True),
                       activation='leaky_relu',
                       name=f'model{self.n_layers}_0', **common)(h, train=train)
        h = concat_tuple(h)
        feats.append(h)

        score = Conv2d(1, kernel_size=kw, stride=1, padding=padw,
                       name=f'model{self.n_layers + 1}_0', dtype=self.dtype)(h)
        return score, feats
