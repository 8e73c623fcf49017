"""Decompose the s2d out head (15.88 ms isolated, round-5 rest-slice probe
— the #1 serving sub-item, ~4.5x above its 3.5 ms roofline) into its parts
and probe exact-semantics variants (VERDICT r4 item 3 attack).

Shipped path (ops/s2d_conv.py::conv2d_reflect_s2d, a=8):
  reflect-pad 512->518, zero-align ->520, space-to-depth -> (16,65,65,4096),
  packed conv (2,2,4096,192) f32-accum VALID -> (16,64,64,192),
  depth-to-space -> (16,512,512,3).

Stages timed with the slope method (25-iter chain minus 5-iter over 20):
  full_a8     the shipped call (reference point; rest-iso measured 15.88)
  pad         reflect pad + zero-align only
  s2d_x       pad + space_to_depth (the 536 MB transpose)
  conv_pre    packed conv on a PRE-transformed input (+slice)
  conv_d2s    packed conv + slice + d2s + bias (compute tail)
  d2s         depth_to_space alone
  full_a4 / full_a16   alternative s2d factors
  conv_bf16   packed conv with bf16 preferred_element_type
  int8_conv   packed conv on the int8 MXU (static scales, dequant epilogue)

Run: PYTHONPATH=/root/repo timeout 2400 python probes/_t_out_head_iso.py [stages]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.ops.pad import pad2d
from lama_tpu.ops.s2d_conv import (conv2d_reflect_s2d, pack_kernel,
                                   space_to_depth, depth_to_space)
from lama_tpu.utils import enable_compilation_cache

B, S, C, CO, K, A = 16, 512, 64, 3, 7, 8


def timed(op, xin, iters):
    @jax.jit
    def f(x0):
        def body(carry, _):
            o = op(x0 + carry.astype(x0.dtype))
            return jnp.sum(o.astype(jnp.float32)) * 0.0, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0]
    np.asarray(f(xin))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(xin))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(name, op, xin):
    ms = (timed(op, xin, 25) - timed(op, xin, 5)) / 20 * 1e3
    print(f'{name}: {ms:.2f} ms', flush=True)
    return ms


def pad_align(t, a=A, p=K // 2):
    tp = pad2d(t, ((p, p), (p, p)), mode='reflect')
    ah = -(-(S + 2 * p) // a) * a
    return jnp.pad(tp, ((0, 0), (0, ah - S - 2 * p),
                        (0, ah - S - 2 * p), (0, 0)))


def main():
    enable_compilation_cache()
    only = set(sys.argv[1].split(',')) if len(sys.argv) > 1 else None

    def want(n):
        return only is None or n in only

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (B, S, S, C), jnp.float32).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (K, K, C, CO)) * 0.05
         ).astype(jnp.bfloat16)
    bias = jnp.zeros((CO,), jnp.bfloat16)
    wp = pack_kernel(w, A, 1)          # (2, 2, 4096, 192)
    xs = space_to_depth(pad_align(x), A)   # (16, 65, 65, 4096)

    r = {}
    if want('full_a8'):
        r['full_a8'] = slope('full_a8', lambda t: jax.nn.sigmoid(
            conv2d_reflect_s2d(t, w, bias=bias, stride=1, a=8)), x)
    if want('pad'):
        r['pad'] = slope('pad', pad_align, x)
    if want('s2d_x'):
        r['s2d_x'] = slope('s2d_x', lambda t: space_to_depth(pad_align(t), A),
                           x)
    if want('conv_pre'):
        r['conv_pre'] = slope('conv_pre', lambda t: jax.lax.conv_general_dilated(
            t, wp, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)[:, :64, :64], xs)
    if want('conv_d2s'):
        def conv_d2s(t):
            o = jax.lax.conv_general_dilated(
                t, wp, (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)[:, :64, :64]
            o = depth_to_space(o, A).astype(t.dtype)
            return jax.nn.sigmoid(o + bias)
        r['conv_d2s'] = slope('conv_d2s', conv_d2s, xs)
    if want('d2s'):
        y = jax.random.uniform(key, (B, 64, 64, A * A * CO),
                               jnp.float32).astype(jnp.bfloat16)
        r['d2s'] = slope('d2s', lambda t: depth_to_space(t, A), y)
    if want('full_a4'):
        r['full_a4'] = slope('full_a4', lambda t: jax.nn.sigmoid(
            conv2d_reflect_s2d(t, w, bias=bias, stride=1, a=4)), x)
    if want('full_a16'):
        r['full_a16'] = slope('full_a16', lambda t: jax.nn.sigmoid(
            conv2d_reflect_s2d(t, w, bias=bias, stride=1, a=16)), x)
    if want('conv_bf16'):
        r['conv_bf16'] = slope('conv_bf16', lambda t: jax.lax.conv_general_dilated(
            t, wp, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.bfloat16)[:, :64, :64], xs)
    if want('s2dconv'):
        # s2d + conv + d2s composed on a PRE-PADDED input: splits the
        # composition penalty between the pad and the s2d transpose.
        xp = pad_align(x)

        def s2dconv(t):
            ts = space_to_depth(t, A)
            o = jax.lax.conv_general_dilated(
                ts, wp, (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)[:, :64, :64]
            return jax.nn.sigmoid(depth_to_space(o, A).astype(t.dtype) + bias)
        r['s2dconv'] = slope('s2dconv', s2dconv, xp)
    if want('phase') or want('phase_nopad'):
        # stride-A "phase conv": kernel (K+A-1, K+A-1, C, A*A*CO) with the
        # 7x7 taps scattered per output phase — NO space-to-depth transpose;
        # d2s on the tiny output only. Exact (CPU parity 2e-6).
        T = K + A - 1
        wr_np = np.zeros((T, T, C, A * A * CO), np.float32)
        wn = np.asarray(w.astype(jnp.float32))
        for dyo in range(A):
            for dxo in range(A):
                for ky in range(K):
                    for kx in range(K):
                        o0 = (dyo * A + dxo) * CO
                        wr_np[dyo + ky, dxo + kx, :, o0:o0 + CO] += wn[ky, kx]
        wr = jnp.asarray(wr_np).astype(jnp.bfloat16)

        def phase_core(tp):
            o = jax.lax.conv_general_dilated(
                tp, wr, (A, A), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
            return jax.nn.sigmoid(depth_to_space(o, A).astype(jnp.bfloat16)
                                  + bias)
        if want('phase'):
            r['phase'] = slope('phase', lambda t: phase_core(
                pad2d(t, ((K // 2, K // 2), (K // 2, K // 2)),
                      mode='reflect')), x)
        if want('phase_nopad'):
            xpp = pad2d(x, ((K // 2, K // 2), (K // 2, K // 2)),
                        mode='reflect')
            r['phase_nopad'] = slope('phase_nopad', phase_core, xpp)
    if want('int8_conv'):
        wq8 = jnp.clip(jnp.round(wp.astype(jnp.float32) / 0.05 * 127), -127,
                       127).astype(jnp.int8)

        def int8_conv(t):
            tq = jnp.clip(jnp.round(t.astype(jnp.float32) * 127.0), -127,
                          127).astype(jnp.int8)
            o = jax.lax.conv_general_dilated(
                tq, wq8, (1, 1), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.int32)[:, :64, :64]
            return o.astype(jnp.float32) * (0.05 / 127.0 / 127.0)
        r['int8_conv'] = slope('int8_conv', int8_conv, xs)

    print('\nresults (ms):', {k: round(v, 2) for k, v in r.items()},
          flush=True)


if __name__ == '__main__':
    main()
