"""NHWC convolution primitives with torch-compatible semantics.

Design notes (TPU-first):
- NHWC activations + HWIO kernels: the native TPU layout; XLA tiles the
  contraction onto the MXU without transposes.
- Padding is materialised with jnp.pad only for reflect/replicate modes
  (reference uses reflect pads: ffc.py:190, pix2pixhd.py:54); zero padding is
  passed straight to the convolution so XLA can fuse it.
- `ConvTranspose2d` reproduces torch's ConvTranspose2d(k, s, p, output_padding)
  exactly via an input-dilated convolution with a spatially-flipped kernel —
  this is what the reference upsampling path uses (ffc.py:350).
- Compute dtype is a parameter (`dtype`): params live in fp32
  (`param_dtype`), activations/weights are cast for the op (bf16-ready).
"""
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pad import pad2d
from .serving_mode import DEFAULT as DEFAULT_MODE, ServingMode

Dtype = Any

# space-to-depth conv transform (ops/s2d_conv.py) for thin-channel reflect
# convs: the `s2d` argument of conv2d ('out_head' | 'all' | None), threaded
# from ServingMode.s2d. The FULL table ('all') is a MEASURED NEGATIVE
# in-graph (v5e, round 2): isolated wins (stem 7.0->4.4ms, out head
# 23.0->17.7ms) INVERT inside the full big-lama graph (129.3 -> 114.8 img/s
# stem-only, 127.8 out-only, 118.3 down1-only; 112.1 all three) — the s2d
# reshuffles break XLA's producer fusion. 'out_head' is the shipped round-4
# win under the int8 headline program (+2.4%, ops/s2d_conv.py doc).

# reflect conv via zero-pad-structured graph + concat border reassembly
# (_conv2d_reflect_border_concat) for inputs with H >= this threshold;
# None disables. Threshold measured on v5e (see BASELINE.md round 2).
REFLECT_BORDER_CONCAT_MIN_H = None

# experimental: route eligible reflect-padded 3x3 convs through the Pallas
# halo kernel (ops/pallas/halo_conv.py); toggled for benchmarking
USE_HALO_CONV = False

# route eligible reflect-padded 3x3 convs through the Pallas kernels in
# ops/pallas/reflect_conv.py (im2col for s1 C=Co=128, width-pair packing for
# s2) — these build the halo in VMEM instead of materialising the padded
# tensor in HBM (measured: matches XLA's zero-pad conv speed; the XLA
# reflect path costs a full padded-tensor round trip on top).
USE_PALLAS_REFLECT = True
# per-kernel toggles. S2 (stride-2 width-pair kernel) is OFF: although it
# beats XLA's reflect conv in isolated micro-benchmarks (4.0 vs 8.2 ms for
# down1 @512² — XLA's conv collapses when fed a materialised concat), the
# END-TO-END big-lama bench regresses 129.3 -> 111.9 img/s with it on: in
# the real graph XLA fuses the reflect concat with the producing BN/ReLU and
# the conv runs near zero-pad speed, while the Pallas call pays the ~170 GB/s
# single-stream DMA ceiling plus fusion-boundary round trips. Keep for
# multi-op fusion experiments; don't enable on shape gates alone.
USE_PALLAS_REFLECT_S1 = True
USE_PALLAS_REFLECT_S2 = False

# perf-probe only (NOT correctness-preserving): when set to an int, reflect
# pads on inputs with H >= this threshold are replaced by fused zero pads —
# used to localise where the zero-pad-everything +11% headroom lives.
PAD_PROBE_ZERO_MIN_H = None


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def _reflect_rows(n: int, lo: int, hi: int):
    """Indices lo..hi-1 reflected into [0, n-1] (torch 'reflect' semantics)."""
    idx = []
    for i in range(lo, hi):
        j = i
        if j < 0:
            j = -j
        if j >= n:
            j = 2 * (n - 1) - j
        idx.append(j)
    return idx


def _conv_valid(x, kernel, stride, dilation, groups):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=stride, padding=((0, 0), (0, 0)),
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _conv2d_reflect_decomposed(x, kernel, stride, padding, dilation, groups):
    """Reflect-padded conv without materialising the padded tensor: the main
    conv runs with (XLA-fused) zero padding — correct everywhere except a
    p-wide output border — and the border rows/cols are recomputed from thin
    input strips gathered with reflected indices.

    MEASURED NEGATIVE RESULT (v5e, big-lama 512²): although reflect-pad
    copies cost ~10% end to end (zero-pad-everything probe: 128.6 -> 142.7
    img/s), this decomposition is SLOWER overall (93 img/s) — the
    .at[].set() border writes materialise full-tensor dynamic-update-slices
    and the strip convs don't pipeline. Kept (exact vs torch across
    k/stride/dilation combinations — see tests) as the starting point for a
    future Pallas halo-conv; NOT wired into conv2d."""
    b, h, w, _ = x.shape
    (ph, _), (pw, _) = padding
    sh, sw = stride
    dh, dw = dilation
    kh, kw = kernel.shape[0], kernel.shape[1]
    eff_kh = dh * (kh - 1) + 1
    eff_kw = dw * (kw - 1) + 1

    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=stride, padding=padding,
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    oh, ow = out.shape[1], out.shape[2]

    # output row o reads input rows [o*s - p, o*s - p + eff_k - 1]; it needs a
    # reflect correction when that range leaves [0, h-1]
    n_top = min(oh, -(-ph // sh))
    n_bot = max(0, min(oh, oh - 1 - (h + ph - eff_kh) // sh))
    n_left = min(ow, -(-pw // sw))
    n_right = max(0, min(ow, ow - 1 - (w + pw - eff_kw) // sw))

    # full-width horizontal reflect pad for row strips (thin: eff_kh rows)
    def row_strip(o):
        rows = _reflect_rows(h, o * sh - ph, o * sh - ph + eff_kh)
        strip = x[:, jnp.asarray(rows), :, :]
        strip = pad2d(strip, ((0, 0), (pw, pw)), mode='reflect')
        return _conv_valid(strip, kernel, (1, sw), dilation, groups)[:, 0]

    def col_strip(o):
        cols = _reflect_rows(w, o * sw - pw, o * sw - pw + eff_kw)
        strip = x[:, :, jnp.asarray(cols), :]
        strip = pad2d(strip, ((ph, ph), (0, 0)), mode='reflect')
        return _conv_valid(strip, kernel, (sh, 1), dilation, groups)[:, :, 0]

    for o in range(n_top):
        out = out.at[:, o].set(row_strip(o))
    for o in range(oh - n_bot, oh):
        out = out.at[:, o].set(row_strip(o))
    for o in range(n_left):
        out = out.at[:, :, o].set(col_strip(o))
    for o in range(ow - n_right, ow):
        out = out.at[:, :, o].set(col_strip(o))
    return out


def _conv2d_reflect_border_concat(x, kernel, stride, padding, dilation, groups):
    """Reflect-padded conv with the zero-pad graph structure: the main conv
    runs with XLA-fused zero padding (no materialised pad tensor); the p-wide
    output border is recomputed from thin reflected strips and the result is
    REASSEMBLED WITH CONCATS (one output copy) instead of the round-1
    decomposition's per-row dynamic-update-slices (which measured 93 img/s,
    see _conv2d_reflect_decomposed). Exact vs torch reflect semantics."""
    b, h, w, _ = x.shape
    (ph, _), (pw, _) = padding
    sh, sw = stride
    dh, dw = dilation
    kh, kw = kernel.shape[0], kernel.shape[1]
    eff_kh = dh * (kh - 1) + 1
    eff_kw = dw * (kw - 1) + 1

    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=stride, padding=padding,
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    oh, ow = out.shape[1], out.shape[2]

    n_top = min(oh, -(-ph // sh))
    n_bot = max(0, min(oh - n_top, oh - 1 - (h + ph - eff_kh) // sh))
    n_left = min(ow, -(-pw // sw))
    n_right = max(0, min(ow - n_left, ow - 1 - (w + pw - eff_kw) // sw))

    def row_strip(o):
        rows = _reflect_rows(h, o * sh - ph, o * sh - ph + eff_kh)
        strip = x[:, jnp.asarray(rows), :, :]
        strip = pad2d(strip, ((0, 0), (pw, pw)), mode='reflect')
        return _conv_valid(strip, kernel, (1, sw), dilation, groups)[:, 0]

    def col_strip(o):
        cols = _reflect_rows(w, o * sw - pw, o * sw - pw + eff_kw)
        strip = x[:, :, jnp.asarray(cols), :]
        strip = pad2d(strip, ((ph, ph), (0, 0)), mode='reflect')
        return _conv_valid(strip, kernel, (sh, 1), dilation, groups)[:, :, 0]

    mid = out[:, n_top: oh - n_bot, n_left: ow - n_right]
    if n_left or n_right:
        lefts = [col_strip(o)[:, n_top: oh - n_bot, None] for o in range(n_left)]
        rights = [col_strip(o)[:, n_top: oh - n_bot, None]
                  for o in range(ow - n_right, ow)]
        mid = jnp.concatenate(lefts + [mid] + rights, axis=2)
    parts = ([row_strip(o)[:, None] for o in range(n_top)] + [mid]
             + [row_strip(o)[:, None] for o in range(oh - n_bot, oh)])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else mid


def conv2d(x, kernel, bias=None, stride=1, padding=0, dilation=1, groups=1,
           padding_mode='zeros', s2d: Optional[str] = None,
           xfold: bool = False):
    """Functional 2-D convolution, NHWC input, HWIO kernel, torch semantics.

    s2d: space-to-depth dispatch policy (None | 'out_head' | 'all') — see
    the module doc above and ops/s2d_conv.py.
    xfold: route thin-INPUT 7x7 stride-1 reflect convs through the kx-tap
    channel fold (ServingMode.xfold_stem; exact semantics)."""
    stride = _pair(stride)
    dilation = _pair(dilation)
    padding = _pair(padding) if not (isinstance(padding, (tuple, list)) and
                                     isinstance(padding[0], (tuple, list))) else padding
    if isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))

    has_pad = any(p != 0 for pair in padding for p in pair)
    if (REFLECT_BORDER_CONCAT_MIN_H is not None and padding_mode == 'reflect'
            and has_pad and x.shape[1] >= REFLECT_BORDER_CONCAT_MIN_H
            and all(p == pair[0] for pair in padding for p in pair)
            and jax.default_backend() not in ('cpu',)):
        out = _conv2d_reflect_border_concat(x, kernel, stride, padding,
                                            dilation, groups)
        if bias is not None:
            out = out + bias.reshape(1, 1, 1, -1).astype(out.dtype)
        return out
    if (xfold and padding_mode == 'reflect' and groups == 1
            and dilation == (1, 1) and stride == (1, 1)
            and kernel.shape[0] == kernel.shape[1] == 7
            and x.shape[-1] <= 8
            and padding[0] == padding[1]
            and padding[0][0] == padding[0][1] == kernel.shape[0] // 2
            and jax.default_backend() not in ('cpu',)):
        from .s2d_conv import conv2d_reflect_xfold
        return conv2d_reflect_xfold(x, kernel, bias=bias)
    if (s2d is not None and padding_mode == 'reflect' and groups == 1
            and dilation == (1, 1) and stride[0] == stride[1]
            and kernel.shape[0] == kernel.shape[1]
            and padding[0] == padding[1]
            and padding[0][0] == padding[0][1] == kernel.shape[0] // 2
            and jax.default_backend() not in ('cpu',)):
        from .s2d_conv import (conv2d_reflect_phase_zsplit,
                               conv2d_reflect_s2d, s2d_factor_for)
        a = s2d_factor_for(x.shape[1], x.shape[2], x.shape[3], kernel.shape[3],
                           kernel.shape[0], stride[0],
                           out_head_only=(s2d == 'out_head'))
        if a is not None and x.shape[1] % a == 0 and x.shape[2] % a == 0:
            if stride[0] == 1 and kernel.shape[3] <= 8:
                # thin-OUTPUT head: the stride-a phase conv avoids the s2d
                # input transpose entirely (15.9 -> 6.9 ms isolated at the
                # big-lama head, probes/_t_out_head_iso.py); the zsplit
                # variant further removes the materialised reflect-pad copy
                # (zero-pad core + recomputed border strips, exact) —
                # in-graph 70.9 -> 69.7 ms/batch on the round-5 headline
                # program (probes/_t_int8_profile.py head_zsplit)
                return conv2d_reflect_phase_zsplit(x, kernel, bias=bias, a=a)
            return conv2d_reflect_s2d(x, kernel, bias=bias, stride=stride[0],
                                      a=a)
    if (USE_PALLAS_REFLECT and padding_mode == 'reflect'
            and padding == ((1, 1), (1, 1)) and dilation == (1, 1)
            and groups == 1 and kernel.shape[0] == 3 and kernel.shape[1] == 3
            and x.dtype == jnp.bfloat16
            and jax.default_backend() not in ('cpu',)):
        from .pallas import reflect_conv as rc
        b_, h_, w_, c_ = x.shape
        co_ = kernel.shape[3]
        bias_ = bias if bias is not None else jnp.zeros((co_,), x.dtype)
        if (USE_PALLAS_REFLECT_S1 and stride == (1, 1)
                and rc.reflect_conv3x3_cols_supported(h_, w_, c_, co_)):
            return rc.reflect_conv3x3_cols_vjp(x, kernel, bias_)
        if (USE_PALLAS_REFLECT_S2 and stride == (2, 2)
                and rc.reflect_down_conv3x3_supported(h_, w_, c_, co_)):
            return rc.reflect_down_conv3x3_vjp(x, kernel, bias_)
    if (USE_HALO_CONV and padding_mode == 'reflect'
            and padding == ((1, 1), (1, 1)) and stride == (1, 1)
            and dilation == (1, 1) and groups == 1
            and kernel.shape[0] == 3 and kernel.shape[1] == 3
            and jax.default_backend() not in ('cpu',)):
        from .pallas.halo_conv import halo_conv3x3_reflect, halo_conv3x3_supported
        if halo_conv3x3_supported(x.shape[1], x.shape[2], x.shape[3],
                                  kernel.shape[3]):
            return halo_conv3x3_reflect(x, kernel, bias=bias, dtype=x.dtype)
    if (PAD_PROBE_ZERO_MIN_H is not None and padding_mode == 'reflect'
            and x.shape[1] >= PAD_PROBE_ZERO_MIN_H):
        padding_mode = 'zeros'
    if padding_mode != 'zeros' and has_pad:
        x = pad2d(x, padding, mode=padding_mode)
        conv_padding = ((0, 0), (0, 0))
    else:
        conv_padding = padding

    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=stride,
        padding=conv_padding,
        rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )
    if bias is not None:
        out = out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)
    return out


def conv_transpose2d(x, kernel, bias=None, stride=2, padding=1, output_padding=1,
                     dilation=1):
    """Functional transposed conv with torch ConvTranspose2d semantics.

    kernel is HWIO with I=in_channels, O=out_channels (already transposed from
    torch's (in, out, kh, kw) layout by the checkpoint converter). Equivalent
    formulation: dilate the input by `stride`, pad by (dilation*(k-1) - p) low /
    (dilation*(k-1) - p + output_padding) high, convolve with the spatially
    flipped kernel.
    """
    stride = _pair(stride)
    padding = _pair(padding)
    output_padding = _pair(output_padding)
    dilation = _pair(dilation)
    kh, kw = kernel.shape[0], kernel.shape[1]
    # note: a 4-phase subpixel decomposition of the k3/s2 case was measured
    # SLOWER than XLA's lhs-dilated conv on v5e (interleave traffic dominates);
    # keeping the native formulation.
    pad_h = dilation[0] * (kh - 1) - padding[0]
    pad_w = dilation[1] * (kw - 1) - padding[1]
    flipped = jnp.flip(kernel, axis=(0, 1))
    out = jax.lax.conv_general_dilated(
        x, flipped,
        window_strides=(1, 1),
        padding=((pad_h, pad_h + output_padding[0]), (pad_w, pad_w + output_padding[1])),
        lhs_dilation=stride,
        rhs_dilation=dilation,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )
    if bias is not None:
        out = out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)
    return out


def avg_pool2d(x, kernel_size=2, stride=None):
    """Average pooling, NHWC (reference: nn.AvgPool2d, ffc.py:123)."""
    kernel_size = _pair(kernel_size)
    stride = _pair(stride) if stride is not None else kernel_size
    window = (1,) + kernel_size + (1,)
    strides = (1,) + stride + (1,)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, 'VALID')
    return summed / (kernel_size[0] * kernel_size[1])


def max_pool2d(x, kernel_size=2, stride=None):
    kernel_size = _pair(kernel_size)
    stride = _pair(stride) if stride is not None else kernel_size
    window = (1,) + kernel_size + (1,)
    strides = (1,) + stride + (1,)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window, strides, 'VALID')


def adaptive_avg_pool2d(x, output_size=(1, 1)):
    """Adaptive average pooling; only uniform cases (as used by the reference:
    global pooling in SELayer squeeze_excitation.py:7, FFCSE ffc.py:24)."""
    oh, ow = _pair(output_size)
    _, h, w, _ = x.shape
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    assert h % oh == 0 and w % ow == 0, 'adaptive pool supports divisible sizes'
    return avg_pool2d(x, (h // oh, w // ow))


def _quant_act_amax(module, x):
    """Static-vs-dynamic activation scale plumbing for the int8 serving path.

    Calibration (module.mode.calibrating, apply with mutable=['quant_stats']):
    sow this call's input amax into the 'quant_stats' collection, reduced
    with max across calls sharing the module (e.g. scan iterations).
    Serving with a calibrated collection merged into the variables: return
    the stored scalar (no per-call reduction). Otherwise: None -> the
    quantized conv computes its dynamic amax."""
    if module.mode.calibrating:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        module.sow('quant_stats', 'act_amax', amax,
                   reduce_fn=jnp.maximum,
                   init_fn=lambda: jnp.zeros((), jnp.float32))
        return None
    if module.has_variable('quant_stats', 'act_amax'):
        return module.get_variable('quant_stats', 'act_amax')
    return None


class Conv2d(nn.Module):
    """Linen conv with torch nn.Conv2d init + semantics (NHWC/HWIO).

    Weight init: kaiming_uniform(a=sqrt(5)) == uniform(±sqrt(1/fan_in)) over
    (kh*kw*in/groups); bias uniform(±sqrt(1/fan_in)) — torch defaults, so
    randomly-initialised training matches the reference distributionally.
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True
    padding_mode: str = 'zeros'
    # opt-out from the int8 serving path (ops/quant.py): set False on convs
    # whose inputs are quantization-hostile (e.g. the FourierUnit's
    # frequency-domain 1x1 conv — DC-dominated dynamic range)
    quantize: bool = True
    # static serving configuration (int8 / zero-pad / s2d), threaded from
    # the generator (ops/serving_mode.py) — part of the module's trace
    # identity, so differently-configured models coexist in one process
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        in_features = x.shape[-1]
        fan_in = in_features // self.groups * kh * kw
        bound = 1.0 / (fan_in ** 0.5)
        init = nn.initializers.uniform(scale=2 * bound)  # uniform in [0, 2b) — shift below

        def kaiming(key, shape, dtype):
            return init(key, shape, dtype) - bound

        kernel = self.param('kernel', kaiming,
                            (kh, kw, in_features // self.groups, self.features),
                            self.param_dtype)
        bias = self.param('bias', kaiming, (self.features,), self.param_dtype) if self.use_bias else None
        dtype = self.dtype or x.dtype
        from . import quant
        if (self.mode.int8 and self.quantize
                and quant.conv_eligible(in_features, self.features,
                                        self.groups, kh, kw, self.mode)):
            # opt-in int8 serving path (precision=int8): int8 MXU contraction
            # with per-channel weight scales and a dynamic activation scale —
            # or a calibrated STATIC one when a 'quant_stats' collection is
            # present (serving.py::calibrate_int8 builds it; static scales
            # drop the per-call amax reduction)
            amax = _quant_act_amax(self, x)
            return quant.quantized_conv2d(
                x, kernel, bias=bias, stride=self.stride, padding=self.padding,
                dilation=self.dilation, groups=self.groups,
                padding_mode=self.padding_mode, out_dtype=dtype,
                act_amax=amax, zero_pad=self.mode.zero_pad)
        out = conv2d(x.astype(dtype), kernel.astype(dtype),
                     bias=None if bias is None else bias,
                     stride=self.stride, padding=self.padding, dilation=self.dilation,
                     groups=self.groups, padding_mode=self.padding_mode,
                     s2d=None if self.mode.s2d == 'off' else self.mode.s2d,
                     xfold=self.mode.xfold_stem)
        return out


class ConvTranspose2d(nn.Module):
    """Linen transposed conv with torch ConvTranspose2d semantics (see
    conv_transpose2d). Kernel param stored HWIO (I=in, O=out)."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 1
    output_padding: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    mode: ServingMode = DEFAULT_MODE
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        in_features = x.shape[-1]
        # torch fan_in for ConvTranspose2d uses weight.size(1) * kh * kw = out_ch * kh * kw
        fan_in = self.features * kh * kw
        bound = 1.0 / (fan_in ** 0.5)
        init = nn.initializers.uniform(scale=2 * bound)

        def kaiming(key, shape, dtype):
            return init(key, shape, dtype) - bound

        kernel = self.param('kernel', kaiming, (kh, kw, in_features, self.features),
                            self.param_dtype)
        bias = self.param('bias', kaiming, (self.features,), self.param_dtype) if self.use_bias else None
        dtype = self.dtype or x.dtype
        from . import quant
        if self.mode.int8 and quant.conv_eligible(in_features, self.features,
                                                  1, kh, kw, self.mode):
            # opt-in int8 serving path — rear upsampling contractions are as
            # deep as the bottleneck convs (512->256) at larger spatial sizes
            amax = _quant_act_amax(self, x)
            return quant.quantized_conv_transpose2d(
                x, kernel, bias=bias, stride=self.stride,
                padding=self.padding, output_padding=self.output_padding,
                out_dtype=dtype, act_amax=amax)
        return conv_transpose2d(x.astype(dtype), kernel.astype(dtype),
                                bias=None if bias is None else bias,
                                stride=self.stride, padding=self.padding,
                                output_padding=self.output_padding)
