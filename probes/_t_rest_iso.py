"""Isolated per-stage timing of the serving "rest" slice under the
round-4/5 headline program semantics (VERDICT r4 item 3).

The rest slice (stem + 3 downs + 3 transposed ups + out head + composite,
~40 ms of the 78 ms headline batch) was last isolated piecewise in the
bf16 era (round 2) — stale, since zero-pad and s2d proved bf16-era numbers
invert under the int8 program. This re-isolates each stage EXACTLY as the
headline program runs it:

  stem        bf16 7x7 4->64 reflect p3 @512² (+bias+relu) — below int8 gates
  down1..3    int8 3x3 s2 zero-pad STATIC-scale convs (+bias+relu epilogue)
  up1..3      int8 3x3 s2 transposed convs, STATIC scales (+bias+relu)
  out_s2d     s2d(a=8) reflect 7x7 64->3 + sigmoid @512² (the shipped head)
  out_plain   plain reflect 7x7 64->3 + sigmoid (s2d comparison)
  concat_in   masked-image concat + f32->bf16 cast @512²
  composite   mask*pred + (1-mask)*img @512² f32

Slope timing (25-iter chain minus 5-iter chain over 20) removes dispatch
and relay overhead; each stage is its own jit program. Sum-of-stages vs
the in-graph headline_noblocks number (probes/_t_int8_profile.py) bounds
what XLA overlap hides.

Run: timeout 3000 python probes/_t_rest_iso.py [stages,comma,list]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.ops.conv import conv2d
from lama_tpu.ops.quant import quantized_conv2d, quantized_conv_transpose2d
from lama_tpu.ops.s2d_conv import conv2d_reflect_s2d
from lama_tpu.utils import enable_compilation_cache

B = 16
S = 512


def timed(op, xin, iters):
    @jax.jit
    def f(x0):
        def body(carry, _):
            o = op(x0 + carry.astype(x0.dtype))
            return jnp.sum(o.astype(jnp.float32)) * 0.0, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0]
    np.asarray(f(xin))  # compile
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


def main():
    enable_compilation_cache()
    only = set(sys.argv[1].split(',')) if len(sys.argv) > 1 else None
    key = jax.random.PRNGKey(0)
    results = {}

    def want(name):
        return only is None or name in only

    def bf16(shape, k=0):
        return jax.random.uniform(jax.random.PRNGKey(k), shape,
                                  jnp.float32).astype(jnp.bfloat16)

    # --- stem: bf16 (in=4 is below the int8 contraction gate)
    if want('stem'):
        x = bf16((B, S, S, 4))
        w = (jax.random.normal(key, (7, 7, 4, 64)) * 0.05).astype(jnp.bfloat16)
        b = jnp.zeros((64,), jnp.bfloat16)
        results['stem'] = slope(
            'stem', lambda t: jax.nn.relu(
                conv2d(t, w, bias=b, padding=3, padding_mode='reflect')), x)

    # --- stem x-fold candidate (round 5): kx taps folded into channels
    if want('stem_xfold'):
        from lama_tpu.ops.s2d_conv import conv2d_reflect_xfold
        x = bf16((B, S, S, 4))
        w = (jax.random.normal(key, (7, 7, 4, 64)) * 0.05).astype(jnp.bfloat16)
        b = jnp.zeros((64,), jnp.bfloat16)
        results['stem_xfold'] = slope(
            'stem_xfold', lambda t: jax.nn.relu(
                conv2d_reflect_xfold(t, w, bias=b)), x)

    # --- downs: int8 + zero-pad + static scale (the headline path)
    for i, (cin, cout, hw) in enumerate([(64, 128, 512), (128, 256, 256),
                                         (256, 512, 128)], start=1):
        name = f'down{i}'
        if not want(name):
            continue
        x = bf16((B, hw, hw, cin), k=i)
        w = (jax.random.normal(key, (3, 3, cin, cout)) * 0.05
             ).astype(jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        amax = jnp.float32(1.0)  # static scale: no dynamic reduction
        results[name] = slope(
            name, lambda t, w=w, b=b: jax.nn.relu(quantized_conv2d(
                t, w, bias=b, stride=2, padding=1, padding_mode='reflect',
                zero_pad=True, act_amax=amax, out_dtype=jnp.bfloat16)), x)

    # --- ups: int8 transposed convs, static scale
    for i, (cin, cout, hw) in enumerate([(512, 256, 64), (256, 128, 128),
                                         (128, 64, 256)], start=1):
        name = f'up{i}'
        if not want(name):
            continue
        x = bf16((B, hw, hw, cin), k=10 + i)
        w = (jax.random.normal(key, (3, 3, cin, cout)) * 0.05
             ).astype(jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        amax = jnp.float32(1.0)
        results[name] = slope(
            name, lambda t, w=w, b=b: jax.nn.relu(
                quantized_conv_transpose2d(
                    t, w, bias=b, stride=2, padding=1, output_padding=1,
                    act_amax=amax, out_dtype=jnp.bfloat16)), x)

    # --- out head: s2d (shipped) vs plain
    if want('out_s2d') or want('out_plain'):
        x = bf16((B, S, S, 64), k=20)
        w = (jax.random.normal(key, (7, 7, 64, 3)) * 0.05).astype(jnp.bfloat16)
        b = jnp.zeros((3,), jnp.bfloat16)
        if want('out_s2d'):
            results['out_s2d'] = slope(
                'out_s2d', lambda t: jax.nn.sigmoid(
                    conv2d_reflect_s2d(t, w, bias=b, stride=1, a=8)), x)
        if want('out_plain'):
            results['out_plain'] = slope(
                'out_plain', lambda t: jax.nn.sigmoid(
                    conv2d(t, w, bias=b, padding=3, padding_mode='reflect')),
                x)

    # --- elementwise glue at full resolution
    if want('concat_in'):
        img = jax.random.uniform(key, (B, S, S, 3), jnp.float32)
        mask = (jax.random.uniform(jax.random.PRNGKey(9), (B, S, S, 1))
                > 0.7).astype(jnp.float32)
        results['concat_in'] = slope(
            'concat_in', lambda t: jnp.concatenate(
                [t * (1 - mask), mask], axis=-1).astype(jnp.bfloat16), img)
    if want('composite'):
        img = jax.random.uniform(key, (B, S, S, 3), jnp.float32)
        mask = (jax.random.uniform(jax.random.PRNGKey(9), (B, S, S, 1))
                > 0.7).astype(jnp.float32)
        results['composite'] = slope(
            'composite', lambda t: (mask * t.astype(jnp.float32)
                                    + (1 - mask) * img), img)

    print('\nper-stage (ms):', {k: round(v, 2) for k, v in results.items()},
          flush=True)
    print('sum:', round(sum(results.values()), 1), 'ms', flush=True)


if __name__ == '__main__':
    main()
