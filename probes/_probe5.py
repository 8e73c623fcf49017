import time
import numpy as np
import jax
import jax.numpy as jnp
from lama_tpu.ops.conv import conv2d

def timed(op, x, iters):
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

def slope_ms(op, x, hi=25, lo=5):
    return (timed(op, x, hi) - timed(op, x, lo)) / (hi - lo) * 1e3

rng = np.random.RandomState(0)
B = 16
cases = [
    ('stem k7s1 4->64 @512', 512, 4, 64, 7, 1, 3),
    ('down1 k3s2 64->128 @512', 512, 64, 128, 3, 2, 1),
    ('down2 k3s2 128->256 @256', 256, 128, 256, 3, 2, 1),
    ('down3 k3s2 256->512 @128', 128, 256, 512, 3, 2, 1),
    ('out k7s1 64->3 @512', 512, 64, 3, 7, 1, 3),
]
for name, hw, c, co, k, s, p in cases:
    x = jax.random.uniform(jax.random.PRNGKey(hw + c), (B, hw, hw, c), jnp.float32).astype(jnp.bfloat16)
    kk = (jax.random.normal(jax.random.PRNGKey(co), (k, k, c, co), jnp.float32) * 0.05).astype(jnp.bfloat16)
    tz = slope_ms(lambda v: conv2d(v, kk, stride=s, padding=p), x)
    tr = slope_ms(lambda v: conv2d(v, kk, stride=s, padding=p, padding_mode='reflect'), x)
    oh = hw // s
    sol = 2 * B * oh * oh * k * k * c * co / 197e12 * 1e3
    print(f'{name}: zero {tz:.3f} | reflect {tr:.3f} | delta {tr-tz:.3f} | SoL {sol:.3f}', flush=True)
