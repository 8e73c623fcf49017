"""Isolated: per-tap-dot Pallas reflect conv (kernel 4) vs XLA reflect/zero
at the FFC bottleneck wide-channel shapes (l2g 128->384, g2l 384->128, and
384->384 for reference). Scan-chained relay-safe timing.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.ops.pad import pad2d
from lama_tpu.ops.pallas.reflect_conv import reflect_conv3x3_taps

B, H, W = 16, 64, 64
CHAIN, REPEATS = 60, 3


def timed(fn, *args):
    @jax.jit
    def chain(*a):
        def body(carry, _):
            out = fn(*((carry,) + a[1:]))
            # scalar fold keeps the dependency chain regardless of C_out
            return carry + (out.astype(jnp.float32).mean() * 1e-6).astype(carry.dtype), ()
        out, _ = jax.lax.scan(body, a[0], None, length=CHAIN)
        return out.mean().reshape(1, 1)

    np.asarray(chain(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(chain(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / CHAIN * 1000


def xla_reflect(x, k):
    p = pad2d(x, ((1, 1), (1, 1)), mode='reflect')
    return jax.lax.conv_general_dilated(p, k, (1, 1), ((0, 0), (0, 0)),
                                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def xla_zero(x, k):
    return jax.lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def pallas_taps(x, k):
    return reflect_conv3x3_taps(x, k)


if __name__ == '__main__':
    rng = np.random.RandomState(0)
    for (c, co) in [(128, 384), (384, 128), (384, 384)]:
        x = jnp.asarray(rng.randn(B, H, W, c).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray((rng.randn(3, 3, c, co) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
        # correctness spot-check once per shape
        a = np.asarray(pallas_taps(x, k).astype(jnp.float32))
        b = np.asarray(xla_reflect(x, k).astype(jnp.float32))
        err = np.abs(a - b).max()
        r = timed(xla_reflect, x, k)
        z = timed(xla_zero, x, k)
        p = timed(pallas_taps, x, k)
        print(f'{c}->{co}: xla_reflect {r:.3f} ms  xla_zero {z:.3f} ms  '
              f'pallas_taps {p:.3f} ms  (maxerr {err:.3e})', flush=True)
