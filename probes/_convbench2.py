import functools, time, sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lama_tpu.ops.conv import conv2d
from lama_tpu.ops.pallas.halo_conv import _kernel as tap_kernel

B, H, W = 16, 64, 64

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

def slope_ms(op, x):
    t_small = timed(op, x, 10)
    t_big = timed(op, x, 110)
    return (t_big - t_small) / 100 * 1e3

def pallas_conv(kfn, v, wk, co):
    c = v.shape[-1]
    return pl.pallas_call(
        kfn, grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, co), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, co), v.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(v, wk)

rng = np.random.RandomState(0)
for c, co in [(128, 128), (384, 128), (128, 384)]:
    x = jnp.asarray(rng.rand(B, H, W, c).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray((rng.randn(3, 3, c, co) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    rows = []
    rows.append(('A zero', slope_ms(lambda v: conv2d(v, k, padding=1), x)))
    rows.append(('B reflect', slope_ms(lambda v: conv2d(v, k, padding=1, padding_mode='reflect'), x)))
    tk = functools.partial(tap_kernel, dtype=jnp.bfloat16)
    rows.append(('C tap', slope_ms(lambda v: pallas_conv(tk, v, k, co), x)))
    sol = 2 * B * H * W * 9 * c * co / 197e12 * 1e3
    print(f'C={c} Co={co} (SoL {sol:.3f}): ' + ' | '.join(f'{n}: {ms:.3f} ms' for n, ms in rows))
