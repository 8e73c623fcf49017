import functools, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, CO = 16, 512, 512, 64, 128
W2, C2 = W // 2, 2 * C
TRS = 64
TRO = TRS // 2
T = H // TRS

key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, H, W, C), jnp.float32).astype(jnp.bfloat16)
wk = (jax.random.normal(jax.random.PRNGKey(1), (3 * C2, 2 * CO), jnp.float32) * 0.05).astype(jnp.bfloat16)

def kern(brow_ref, xv_ref, w_ref, o_ref, *, variant):
    co = CO
    buf = jnp.concatenate([brow_ref[0], xv_ref[0]], axis=0)
    view = buf[0:TRS].reshape(TRO, 2, W2, C2)
    r0 = view[:, 0]
    r1 = view[:, 1]
    r2 = jnp.concatenate([view[1:, 0], buf[TRS:TRS + 1]], axis=0)
    if variant == 'full':
        band = jnp.concatenate([r0, r1, r2], axis=-1)
        full = jax.lax.dot_general(band, w_ref[...], (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc = full[:, :, :co] + jnp.concatenate(
            [full[:, 0:1, co:], full[:, :-1, co:]], axis=1)
    elif variant == 'noshift':
        band = jnp.concatenate([r0, r1, r2], axis=-1)
        full = jax.lax.dot_general(band, w_ref[...], (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc = full[:, :, :co] + full[:, :, co:]
    elif variant == 'noband':
        acc = None
        for i, r in enumerate((r0, r1, r2)):
            t = jax.lax.dot_general(r, w_ref[i * C2:(i + 1) * C2],
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        acc = acc[:, :, :co] + acc[:, :, co:]
    elif variant == 'noview':
        # wrong semantics: dot on raw block rows (no parity view/concat)
        band = jnp.concatenate([xv_ref[0, :TRO], xv_ref[0, 1:TRO+1],
                                xv_ref[0, 2:TRO+2]], axis=-1)
        full = jax.lax.dot_general(band, w_ref[...], (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc = full[:, :, :co] + full[:, :, co:]
    elif variant == 'dotonly':
        # wrong semantics: single K=C2 dot, no structure at all
        full = jax.lax.dot_general(xv_ref[0, :TRO], w_ref[:C2],
                                   (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc = full[:, :, :co] + full[:, :, co:]
    o_ref[0] = acc.astype(o_ref.dtype)

def run(v, xin):
    xv = xin.reshape(B, H, W2, C2)
    brows = jnp.concatenate([xv[:, 1:2], xv[:, TRS - 1:H - 1:TRS]], axis=1)
    return pl.pallas_call(
        functools.partial(kern, variant=v),
        grid=(B, T),
        in_specs=[pl.BlockSpec((1, 1, W2, C2), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, TRS, W2, C2), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TRO, W2, CO), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W2, CO), xin.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
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

for v in sys.argv[1:]:
    op = lambda xin, v=v: run(v, xin)
    print(f'{v}: {(timed(op, 25) - timed(op, 5)) / 20 * 1e3:.3f} ms')
