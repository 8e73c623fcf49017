import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from lama_tpu.ops.conv import conv2d

B, H, W, C, CO = 16, 512, 512, 64, 128
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, H, W, C), jnp.float32).astype(jnp.bfloat16)
k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, CO), jnp.float32) * 0.05).astype(jnp.bfloat16)

def conv(v, pad, stride=(2, 2)):
    return jax.lax.conv_general_dilated(
        v, k, window_strides=stride, padding=pad,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

def rowreflect_colfix(v):
    # rows: reflect via H-concat (tile-aligned, cheap); cols: fused zero pad
    ph = jnp.concatenate([v[:, 1:2], v, v[:, H - 2:H - 1]], axis=1)
    main = conv(ph, ((0, 0), (1, 0)))            # (B, 256, 256, CO)
    # left output col: in cols -1(=col1),0,1
    strip = jnp.concatenate([ph[:, :, 1:2], ph[:, :, 0:2]], axis=2)
    col0 = conv(strip, ((0, 0), (0, 0)))         # (B, 256, 1, CO)
    return jnp.concatenate([col0, main[:, :, 1:]], axis=2)

def rowreflect_only(v):  # timing control: skip the col fix entirely
    ph = jnp.concatenate([v[:, 1:2], v, v[:, H - 2:H - 1]], axis=1)
    return conv(ph, ((0, 0), (1, 0)))

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
        t0 = time.perf_counter(); np.asarray(f(xin)); t1 = time.perf_counter()
        best = min(best, t1 - t0)
    return best

def slope(op):
    return (timed(op, x, 25) - timed(op, x, 5)) / 20 * 1e3

ref = conv2d(x, k, stride=2, padding=1, padding_mode='reflect')
err = float(jnp.abs(rowreflect_colfix(x).astype(jnp.float32) - ref.astype(jnp.float32)).max())
print(f'rowreflect_colfix err {err}', flush=True)
if 'time' in sys.argv:
    print(f'rowreflect_only: {slope(rowreflect_only):.3f} ms', flush=True)
    print(f'rowreflect_colfix: {slope(rowreflect_colfix):.3f} ms', flush=True)
