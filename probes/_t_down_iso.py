import functools, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, CO = 16, 512, 512, 64, 128
W2, C2 = W // 2, 2 * C
TRS = 256; TRO = TRS // 2; T = H // TRS
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, H, W, C), jnp.float32).astype(jnp.bfloat16)
xv0 = jnp.reshape(x, (B, H, W2, C2))  # materialized once outside timing
wk = (jax.random.normal(jax.random.PRNGKey(1), (3 * C2, 2 * CO), jnp.float32) * 0.05).astype(jnp.bfloat16)

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

def slope(op, xin):
    return (timed(op, xin, 25) - timed(op, xin, 5)) / 20 * 1e3

def kern_full(brow_ref, xv_ref, w_ref, o_ref):
    buf = jnp.concatenate([brow_ref[0], xv_ref[0]], axis=0)
    view = buf[0:TRS].reshape(TRO, 2, W2, C2)
    r0 = view[:, 0]; r1 = view[:, 1]
    r2 = jnp.concatenate([view[1:, 0], buf[TRS:TRS + 1]], axis=0)
    band = jnp.concatenate([r0, r1, r2], axis=-1)
    full = jax.lax.dot_general(band, w_ref[...], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc = full[:, :, :CO] + jnp.concatenate(
        [full[:, 0:1, CO:], full[:, :-1, CO:]], axis=1)
    o_ref[0] = acc.astype(o_ref.dtype)

def kern_pass(xv_ref, o_ref):
    o_ref[0] = xv_ref[0][:TRO, :, :CO]

which = sys.argv[1]
if which == 'reshape':
    print(f'reshape copy: {slope(lambda v: jnp.reshape(v, (B, H, W2, C2)) * 1.0, x):.3f} ms', flush=True)
elif which == 'pass':
    def op(xv):
        return pl.pallas_call(
            kern_pass, grid=(B, T),
            in_specs=[pl.BlockSpec((1, TRS, W2, C2), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TRO, W2, CO), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H // 2, W2, CO), xv.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024,
                                                 dimension_semantics=('parallel', 'arbitrary')),
        )(xv)
    print(f'passthrough (pre-reshaped): {slope(op, xv0):.3f} ms', flush=True)
elif which == 'fullpre':
    def op(xv):
        brows = jnp.concatenate([xv[:, 1:2], xv[:, TRS - 1:H - 1:TRS]], axis=1)
        return pl.pallas_call(
            kern_full, grid=(B, T),
            in_specs=[pl.BlockSpec((1, 1, W2, C2), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, TRS, W2, C2), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TRO, W2, CO), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H // 2, W2, CO), xv.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024,
                                                 dimension_semantics=('parallel', 'arbitrary')),
        )(brows, xv, wk)
    print(f'full kernel (pre-reshaped in): {slope(op, xv0):.3f} ms', flush=True)
