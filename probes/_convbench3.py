import functools, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lama_tpu.ops.conv import conv2d

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
    return (timed(op, x, 110) - timed(op, x, 10)) / 100 * 1e3

def reflect_pad_hw(v):
    h, w = v.shape[0], v.shape[1]
    v = jnp.concatenate([v[1:2], v, v[h - 2:h - 1]], axis=0)
    return jnp.concatenate([v[:, 1:2], v, v[:, w - 2:w - 1]], axis=1)

# variant F: band scratch (H+2, W, 3C) via stores, 3 dots K=3C
def band_kernel(x_ref, w_ref, o_ref, band, *, c, co):
    p = reflect_pad_hw(x_ref[0]).astype(jnp.bfloat16)
    for kx in range(3):
        band[:, :, kx * c:(kx + 1) * c] = p[:, kx:kx + W, :]
    acc = None
    for ky in range(3):
        t = jax.lax.dot_general(band[ky:ky + H], w_ref[ky].astype(jnp.bfloat16),
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    o_ref[0] = acc.astype(o_ref.dtype)

# variant G: full im2col scratch (H, W, 9C) via stores, 1 dot K=9C
def cols_kernel(x_ref, w_ref, o_ref, cols, *, c, co):
    p = reflect_pad_hw(x_ref[0]).astype(jnp.bfloat16)
    t = 0
    for ky in range(3):
        for kx in range(3):
            cols[:, :, t * c:(t + 1) * c] = p[ky:ky + H, kx:kx + W, :]
            t += 1
    acc = jax.lax.dot_general(cols[...], w_ref[...].astype(jnp.bfloat16),
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)

def make(kfn, c, co, scratch_shape, wshape):
    def f(v, wk):
        return pl.pallas_call(
            functools.partial(kfn, c=c, co=co),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, H, W, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W, co), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, co), v.dtype),
            scratch_shapes=[pltpu.VMEM(scratch_shape, jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        )(v, wk.reshape(wshape))
    return f

rng = np.random.RandomState(0)
for c, co in [(128, 128), (384, 128), (128, 384)]:
    x = jnp.asarray(rng.rand(B, H, W, c).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray((rng.randn(3, 3, c, co) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    ref = np.asarray(conv2d(x, k, padding=1, padding_mode='reflect')).astype(np.float32)

    # w layouts: band wants (3, 3c, co) with [ky][kx*c+ci]; cols wants (9c, co)
    kb = k.transpose(0, 1, 2, 3).reshape(3, 3 * c, co)
    kc = k.reshape(9 * c, co)
    fF = make(band_kernel, c, co, (H + 2, W, 3 * c), (3, 3 * c, co))
    fG = make(cols_kernel, c, co, (H, W, 9 * c), (9 * c, co))

    rows = []
    for name, f, wk in [('F band', fF, kb), ('G cols', fG, kc)]:
        try:
            out = np.asarray(jax.jit(f)(x, wk)).astype(np.float32)
            err = np.abs(out - ref).max()
            ms = slope_ms(lambda v, f=f, wk=wk: f(v, wk), x)
            rows.append(f'{name}: {ms:.3f} ms (err {err:.3f})')
        except Exception as e:
            rows.append(f'{name}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}')
    print(f'C={c} Co={co}: ' + ' | '.join(rows))
