"""Fused FourierUnit Pallas kernel: interpret-mode parity vs the XLA module
path (exact same parameters), plus planar weight folding unit checks."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from lama_tpu.models.ffc import FourierUnit
from lama_tpu.ops.pallas.fourier_unit import (_planar_params, _planar_perm,
                                              fourier_unit_supported,
                                              fused_fourier_unit)


def test_planar_perm_roundtrip():
    c = 6
    perm = _planar_perm(c)
    # planar p = j*C + c maps to interleaved 2c+j
    assert perm[0] == 0          # (j=0, c=0) -> re of ch0
    assert perm[c] == 1          # (j=1, c=0) -> im of ch0
    assert sorted(perm.tolist()) == list(range(2 * c))


def test_planar_params_fold(rng):
    c, co = 4, 4
    kern = rng.randn(1, 1, 2 * c, 2 * co).astype(np.float32)
    gamma = rng.rand(2 * co).astype(np.float32) + 0.5
    beta = rng.randn(2 * co).astype(np.float32)
    mean = rng.randn(2 * co).astype(np.float32)
    var = rng.rand(2 * co).astype(np.float32) + 0.5
    w, b = _planar_params(kern, gamma, beta, mean, var)
    assert w.shape == (2 * c, 2 * co)
    # folded result on a random input == conv + BN applied separately
    x = rng.randn(3, 2 * c).astype(np.float32)
    y_ref = (x @ kern[0, 0] - mean) / np.sqrt(var + 1e-5) * gamma + beta
    y_planar = x[:, _planar_perm(c)] @ w + b
    # y_planar[q] == y_int[perm_out[q]] -> invert the output permutation
    inv = np.argsort(_planar_perm(co))
    np.testing.assert_allclose(y_planar[:, inv], y_ref, rtol=1e-4, atol=1e-5)


def test_fused_fourier_unit_interpret_parity(rng):
    """Interpret mode (runs on CPU) must match the XLA FourierUnit with the
    same parameters to fp32 rounding."""
    x = jnp.asarray(rng.rand(2, 16, 16, 8).astype(np.float32))
    fu = FourierUnit(features=8)
    v = fu.init(jax.random.PRNGKey(0), x, train=False)
    ref = fu.apply(v, x, train=False)
    out = fused_fourier_unit(
        x, v['params']['conv_layer']['kernel'],
        v['params']['bn']['scale'], v['params']['bn']['bias'],
        v['batch_stats']['bn']['mean'], v['batch_stats']['bn']['var'],
        dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_supported_envelope():
    assert fourier_unit_supported(64, 64, 192)
    assert not fourier_unit_supported(512, 512, 192)


def test_reflect_conv3x3_cols_interpret_parity(rng):
    """im2col reflect conv (interpret mode) == reflect pad + conv, with and
    without bias."""
    from lama_tpu.ops.conv import conv2d
    from lama_tpu.ops.pallas.reflect_conv import (
        reflect_conv3x3_cols, reflect_conv3x3_cols_supported)

    assert reflect_conv3x3_cols_supported(64, 64, 128, 128)
    assert not reflect_conv3x3_cols_supported(64, 64, 384, 128)
    assert not reflect_conv3x3_cols_supported(512, 512, 128, 128)

    x = jnp.asarray(rng.rand(2, 16, 16, 128).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 128, 128) * 0.05).astype(np.float32))
    bias = jnp.asarray(rng.randn(128).astype(np.float32))
    for b in (None, bias):
        ref = conv2d(x, k, bias=b, padding=1, padding_mode='reflect')
        out = reflect_conv3x3_cols(x, k, bias=b, dtype=jnp.float32,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_reflect_down_conv3x3_interpret_parity(rng):
    """width-pair stride-2 reflect conv (interpret mode) == reflect pad +
    strided conv across the downsample shapes (incl. multi-row-tile H=128
    and the single-tile H=64 case)."""
    from lama_tpu.ops.conv import conv2d
    from lama_tpu.ops.pallas.reflect_conv import (
        reflect_down_conv3x3, reflect_down_conv3x3_supported)

    assert reflect_down_conv3x3_supported(512, 512, 64, 128)
    assert not reflect_down_conv3x3_supported(512, 512, 4, 128)   # 2C not 128k
    assert not reflect_down_conv3x3_supported(511, 512, 64, 128)  # odd H

    for (h, w, c, co) in [(128, 128, 64, 128), (64, 64, 128, 256),
                          (64, 32, 256, 512)]:
        x = jnp.asarray(rng.rand(2, h, w, c).astype(np.float32))
        k = jnp.asarray((rng.randn(3, 3, c, co) * 0.05).astype(np.float32))
        bias = jnp.asarray(rng.randn(co).astype(np.float32))
        for b in (None, bias):
            ref = conv2d(x, k, bias=b, stride=2, padding=1,
                         padding_mode='reflect')
            out = reflect_down_conv3x3(x, k, bias=b, dtype=jnp.float32,
                                       interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-5)


def test_reflect_conv_custom_vjp(rng):
    """Gradients through the custom_vjp wrappers == gradients through the
    XLA reflect path (x, kernel, and bias grads; both strides)."""
    import functools
    from lama_tpu.ops.conv import conv2d
    from lama_tpu.ops.pallas import reflect_conv as rc

    for stride, fn in [
            (1, functools.partial(rc.reflect_conv3x3_cols,
                                  dtype=jnp.float32, interpret=True)),
            (2, functools.partial(rc.reflect_down_conv3x3,
                                  dtype=jnp.float32, interpret=True))]:
        wrapped = rc._diff_wrap(lambda x, k, bias, fn=fn: fn(x, k, bias=bias),
                                stride=stride)
        c, co = 128, 128 if stride == 1 else 256
        x = jnp.asarray(rng.rand(2, 16, 16, c).astype(np.float32))
        k = jnp.asarray((rng.randn(3, 3, c, co) * 0.05).astype(np.float32))
        bias = jnp.asarray(rng.randn(co).astype(np.float32))

        def loss_pallas(x, k, b):
            return jnp.sum(jnp.tanh(wrapped(x, k, b)))

        def loss_xla(x, k, b):
            return jnp.sum(jnp.tanh(conv2d(x, k, bias=b, stride=stride,
                                           padding=1, padding_mode='reflect')))

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, bias)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k, bias)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


def test_halo_conv3x3_interpret_parity(rng):
    """Pallas halo conv (interpret mode on CPU) == reflect pad + conv."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from lama_tpu.ops.conv import conv2d
    from lama_tpu.ops.pallas import halo_conv

    b, h, w, c, co = 2, 16, 16, 8, 8
    x = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, c, co) * 0.1).astype(np.float32))
    ref = conv2d(x, k, padding=1, padding_mode='reflect')
    out = pl.pallas_call(
        functools.partial(halo_conv._kernel, dtype=jnp.float32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        interpret=True)(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('k,s,h,w,c,co', [
    (3, 1, 32, 128, 8, 16),
    (3, 2, 64, 128, 8, 16),
    (7, 1, 32, 128, 8, 16),
    (3, 2, 64, 256, 16, 32),
])
def test_halo_conv_tiled_matches_torch_reflect(rng, k, s, h, w, c, co):
    """Row-tiled strided halo conv (interpret mode): bit-parity vs torch
    reflect-padded conv, including the boundary tiles' reflect rows."""
    import torch
    import torch.nn.functional as TF

    from lama_tpu.ops.pallas.halo_conv import (halo_conv_reflect_tiled,
                                               halo_conv_reflect_tiled_supported)

    assert halo_conv_reflect_tiled_supported(h, w, c, co, k, s)
    p = k // 2
    x = rng.randn(2, h, w, c).astype(np.float32)
    kern = rng.randn(k, k, c, co).astype(np.float32) * 0.1
    bias = rng.randn(co).astype(np.float32)

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    kt = torch.from_numpy(np.transpose(kern, (3, 2, 0, 1)))
    ref = TF.conv2d(TF.pad(xt, [p] * 4, mode='reflect'), kt,
                    bias=torch.from_numpy(bias), stride=s).numpy()

    out = halo_conv_reflect_tiled(jnp.asarray(x), jnp.asarray(kern),
                                  bias=jnp.asarray(bias), stride=s,
                                  dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-4)


def test_reflect_conv3x3_taps_interpret_parity(rng):
    """per-tap-dot wide-channel reflect conv (interpret mode) == reflect pad
    + conv, with and without bias."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lama_tpu.ops.pad import pad2d
    from lama_tpu.ops.pallas.reflect_conv import (reflect_conv3x3_taps,
                                                  reflect_conv3x3_taps_supported)

    x = jnp.asarray(rng.randn(2, 16, 16, 256).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 256, 128).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(128).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        pad2d(x, ((1, 1), (1, 1)), mode='reflect'), k, (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = reflect_conv3x3_taps(x, k, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(out, ref, atol=1e-4)
    out_b = reflect_conv3x3_taps(x, k, bias=bias, dtype=jnp.float32,
                                 interpret=True)
    np.testing.assert_allclose(out_b, ref + bias, atol=1e-4)
    assert reflect_conv3x3_taps_supported(64, 64, 384, 128)
    assert not reflect_conv3x3_taps_supported(64, 64, 128, 128)  # kernel 1's
    assert not reflect_conv3x3_taps_supported(64, 64, 192, 128)
