import time
import numpy as np
import jax
import jax.numpy as jnp
from lama_tpu.ops.conv import conv2d
from lama_tpu.ops.pallas.reflect_conv import (reflect_conv3x3_cols,
                                              reflect_down_conv3x3)

def timed(op, x, iters):
    def body(carry, _):
        o = op(x + carry.astype(x.dtype))
        return jnp.sum(o.astype(jnp.float32)) * 0.0, None
    f = jax.jit(lambda x0: jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0])
    np.asarray(f(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f(x)); t1 = time.perf_counter()
        best = min(best, t1 - t0)
    return best

def slope_ms(op, x, hi=30, lo=5):
    return (timed(op, x, hi) - timed(op, x, lo)) / (hi - lo) * 1e3

def mkdata(key, shape):
    return jax.random.uniform(key, shape, dtype=jnp.float32).astype(jnp.bfloat16)

B = 16
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 16)

# l2l shape
x = mkdata(ks[0], (B, 64, 64, 128))
k = (jax.random.normal(ks[1], (3, 3, 128, 128), jnp.float32) * 0.05).astype(jnp.bfloat16)
err = jnp.abs(reflect_conv3x3_cols(x, k).astype(jnp.float32)
              - conv2d(x, k, padding=1, padding_mode='reflect').astype(jnp.float32)).max()
print('cols l2l maxerr:', float(err))
print(f'cols l2l: pallas {slope_ms(lambda v: reflect_conv3x3_cols(v, k), x):.3f} ms | '
      f'reflect {slope_ms(lambda v: conv2d(v, k, padding=1, padding_mode="reflect"), x):.3f} ms')

for i, (hw, c, co) in enumerate([(512, 64, 128), (256, 128, 256), (128, 256, 512)]):
    x = mkdata(ks[2 + 2 * i], (B, hw, hw, c))
    k = (jax.random.normal(ks[3 + 2 * i], (3, 3, c, co), jnp.float32) * 0.05).astype(jnp.bfloat16)
    err = jnp.abs(reflect_down_conv3x3(x, k).astype(jnp.float32)
                  - conv2d(x, k, stride=2, padding=1, padding_mode='reflect').astype(jnp.float32)).max()
    tp = slope_ms(lambda v: reflect_down_conv3x3(v, k), x)
    tr = slope_ms(lambda v: conv2d(v, k, stride=2, padding=1, padding_mode='reflect'), x)
    tz = slope_ms(lambda v: conv2d(v, k, stride=2, padding=1), x)
    print(f'down @{hw} {c}->{co}: pallas {tp:.3f} | reflect {tr:.3f} | zero {tz:.3f} ms (err {float(err):.3f})')
