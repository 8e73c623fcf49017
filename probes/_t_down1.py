import time, sys
import numpy as np
import jax
import jax.numpy as jnp
from lama_tpu.ops.conv import conv2d
from lama_tpu.ops.pallas.reflect_conv import reflect_down_conv3x3

B, hw, c, co = 16, 512, 64, 128
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, hw, hw, c), jnp.float32).astype(jnp.bfloat16)
k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, co), jnp.float32) * 0.05).astype(jnp.bfloat16)

which = sys.argv[1]
if which == 'parity':
    err = jnp.abs(reflect_down_conv3x3(x, k).astype(jnp.float32)
                  - conv2d(x, k, stride=2, padding=1, padding_mode='reflect').astype(jnp.float32)).max()
    print('down1 maxerr:', float(err))
    sys.exit()

ops = {
    'pallas': lambda v: reflect_down_conv3x3(v, k),
    'reflect': lambda v: conv2d(v, k, stride=2, padding=1, padding_mode='reflect'),
    'zero': lambda v: conv2d(v, k, stride=2, padding=1),
}
op = ops[which]

def timed(iters):
    @jax.jit
    def f(x0):
        def body(carry, _):
            o = op(x0 + carry.astype(x0.dtype))
            return jnp.sum(o.astype(jnp.float32)) * 0.0, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0]
    np.asarray(f(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f(x)); t1 = time.perf_counter()
        best = min(best, t1 - t0)
    return best

print(f'{which}: {(timed(25) - timed(5)) / 20 * 1e3:.3f} ms')
