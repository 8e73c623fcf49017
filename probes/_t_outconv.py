import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from lama_tpu.ops.pad import pad2d

B, H, W, C, CO = 16, 512, 512, 64, 3
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, H, W, C), jnp.float32).astype(jnp.bfloat16)
k = (jax.random.normal(jax.random.PRNGKey(1), (7, 7, C, CO), jnp.float32) * 0.05).astype(jnp.bfloat16)

def conv_nhwc(v):
    p = pad2d(v, ((3, 3), (3, 3)), mode='reflect')
    return jax.lax.conv_general_dilated(
        p, k, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

def conv_nchw_out(v):
    p = pad2d(v, ((3, 3), (3, 3)), mode='reflect')
    return jax.lax.conv_general_dilated(
        p, k, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NCHW'))

def conv_nchw_out_t(v):
    return jnp.transpose(conv_nchw_out(v), (0, 2, 3, 1))

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
    return (timed(op, x, 15) - timed(op, x, 3)) / 12 * 1e3

err = float(jnp.abs(conv_nchw_out_t(x).astype(jnp.float32)
                    - conv_nhwc(x).astype(jnp.float32)).max())
print(f'nchw_out err {err}', flush=True)
for name, op in [('nhwc', conv_nhwc), ('nchw_out', conv_nchw_out),
                 ('nchw_out+T', conv_nchw_out_t)]:
    print(f'{name}: {slope(op):.3f} ms', flush=True)
