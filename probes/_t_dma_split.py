import functools, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W2, C2, CO = 16, 512, 256, 128, 128
TRS = 256; TRO = TRS // 2; T = H // TRS
key = jax.random.PRNGKey(0)
xv = jax.random.uniform(key, (B, H, W2, C2), jnp.float32).astype(jnp.bfloat16)

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
    return (timed(op, xv, 25) - timed(op, xv, 5)) / 20 * 1e3

def kern_split(*refs):
    o_ref = refs[-1]
    n = len(refs) - 1
    pieces = [r[0][:TRO // n, :, :CO] for r in refs[:n]]
    o_ref[0] = jnp.concatenate(pieces, axis=0)

def op_split(n):
    def op(v):
        sub = TRS // n
        specs = [pl.BlockSpec((1, sub, W2, C2),
                              (lambda j: lambda i, t: (i, t * n + j, 0, 0))(j),
                              memory_space=pltpu.VMEM) for j in range(n)]
        return pl.pallas_call(
            kern_split, grid=(B, T),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, TRO, W2, CO), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H // 2, W2, CO), v.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024,
                                                 dimension_semantics=('parallel', 'arbitrary')),
        )(*([v] * n))
    return op

for n in [int(a) for a in sys.argv[1:]]:
    print(f'split {n}: {slope(op_split(n)):.3f} ms', flush=True)
