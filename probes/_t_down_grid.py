import functools, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, CO = 16, 512, 512, 64, 128
W2, C2 = W // 2, 2 * C
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, H, W, C), jnp.float32).astype(jnp.bfloat16)
wk = (jax.random.normal(jax.random.PRNGKey(1), (3 * C2, 2 * CO), jnp.float32) * 0.05).astype(jnp.bfloat16)

def kern(brow_ref, xv_ref, w_ref, o_ref, *, trs):
    tro = trs // 2
    buf = jnp.concatenate([brow_ref[0], xv_ref[0]], axis=0)
    view = buf[0:trs].reshape(tro, 2, W2, C2)
    r0 = view[:, 0]; r1 = view[:, 1]
    r2 = jnp.concatenate([view[1:, 0], buf[trs:trs + 1]], axis=0)
    band = jnp.concatenate([r0, r1, r2], axis=-1)
    full = jax.lax.dot_general(band, w_ref[...], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc = full[:, :, :CO] + jnp.concatenate(
        [full[:, 0:1, CO:], full[:, :-1, CO:]], axis=1)
    o_ref[0] = acc.astype(o_ref.dtype)

def run(xin, trs, par):
    T = H // trs
    xv = xin.reshape(B, H, W2, C2)
    brows = jnp.concatenate([xv[:, 1:2], xv[:, trs - 1:H - 1:trs]], axis=1)
    cp = dict(vmem_limit_bytes=128 * 1024 * 1024)
    if par:
        cp['dimension_semantics'] = ('parallel', 'arbitrary')
    return pl.pallas_call(
        functools.partial(kern, trs=trs),
        grid=(B, T),
        in_specs=[pl.BlockSpec((1, 1, W2, C2), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, trs, W2, C2), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, trs // 2, W2, CO), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W2, CO), xin.dtype),
        compiler_params=pltpu.CompilerParams(**cp),
    )(brows, xv, wk)

def timed(op, iters):
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

for spec in sys.argv[1:]:
    trs, par = spec.split(',')
    trs, par = int(trs), int(par)
    op = lambda xin: run(xin, trs, par)
    print(f'trs={trs} par={par}: {(timed(op, 25) - timed(op, 5)) / 20 * 1e3:.3f} ms', flush=True)
