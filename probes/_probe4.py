import functools, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lama_tpu.ops.conv import conv2d

B, H, W = 16, 64, 64
rng = np.random.RandomState(0)

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

# --- 1. rank-4 row-parity view in kernel ---
def k_phase(x_ref, o_ref):
    v = x_ref[0]                       # (16, 64, 128)
    v4 = v.reshape(8, 2, 64, 128)
    even = v4[:, 0]
    odd = v4[:, 1]
    o_ref[0] = jnp.concatenate([even, odd], axis=0)
x = jnp.asarray(rng.rand(2, 16, 64, 128).astype(np.float32)).astype(jnp.bfloat16)
try:
    out = pl.pallas_call(
        k_phase, grid=(2,),
        in_specs=[pl.BlockSpec((1, 16, 64, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, 64, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 16, 64, 128), x.dtype))(x)
    a = np.asarray(x[0])
    ref = np.concatenate([a[0::2], a[1::2]], 0)
    print('rank4-phase:', 'OK' if np.allclose(np.asarray(out[0]), ref) else 'WRONG')
except Exception as e:
    print(f'rank4-phase: FAIL {type(e).__name__}: {str(e).splitlines()[0][:110]}')

# --- 2. lane slice at offset 64 (half register) ---
def k_l64(x_ref, o_ref):
    o_ref[0] = x_ref[0][:, :, 64:192]
try:
    out = pl.pallas_call(
        k_l64, grid=(2,),
        in_specs=[pl.BlockSpec((1, 16, 64, 256), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, 64, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 16, 64, 128), jnp.bfloat16))(
            jnp.asarray(rng.rand(2, 16, 64, 256).astype(np.float32)).astype(jnp.bfloat16))
    print('lane-slice-64: OK')
except Exception as e:
    print(f'lane-slice-64: FAIL {type(e).__name__}: {str(e).splitlines()[0][:110]}')

# --- 3. sublane-shifted f32 add cost: acc + shifted(acc) ---
def k_shadd(x_ref, o_ref):
    v = x_ref[0].astype(jnp.float32)
    s = jnp.concatenate([v[:, 0:1], v[:, :-1]], axis=1)
    o_ref[0] = (v + s).astype(o_ref.dtype)
def f_shadd(v):
    return pl.pallas_call(
        k_shadd, grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 128), v.dtype))(v)
xb = jnp.asarray(rng.rand(B, H, W, 128).astype(np.float32)).astype(jnp.bfloat16)
try:
    np.asarray(jnp.sum(jax.jit(f_shadd)(xb).astype(jnp.float32)))
    print(f'sublane-shift-add: OK {slope_ms(f_shadd, xb):.3f} ms')
except Exception as e:
    print(f'sublane-shift-add: FAIL {type(e).__name__}: {str(e).splitlines()[0][:110]}')

# --- 4. chunked im2col for wide C (g2l 384->128): 3 chunks of 128 ---
def reflect_pad_hw(v):
    h, w = v.shape[0], v.shape[1]
    v = jnp.concatenate([v[1:2], v, v[h - 2:h - 1]], axis=0)
    return jnp.concatenate([v[:, 1:2], v, v[:, w - 2:w - 1]], axis=1)

def k_chunk(x_ref, w_ref, o_ref, cols, *, c, co, nch):
    acc = None
    for ch in range(nch):
        p = reflect_pad_hw(x_ref[0, :, :, ch * c:(ch + 1) * c]).astype(jnp.bfloat16)
        t = 0
        for ky in range(3):
            for kx in range(3):
                cols[:, :, t * c:(t + 1) * c] = p[ky:ky + H, kx:kx + W, :]
                t += 1
        part = jax.lax.dot_general(cols[...], w_ref[ch].astype(jnp.bfloat16),
                                   (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    o_ref[0] = acc.astype(o_ref.dtype)

for (cin, co) in [(384, 128), (128, 384)]:
    nch = cin // 128
    c = 128
    xw = jnp.asarray(rng.rand(B, H, W, cin).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray((rng.randn(3, 3, cin, co) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    # weight layout (nch, 9c, co): chunk ch, tap t=(ky*3+kx), ci
    wk = k.reshape(3, 3, nch, c, co).transpose(2, 0, 1, 3, 4).reshape(nch, 9 * c, co)
    def f(v, wk=wk, co=co, nch=nch):
        return pl.pallas_call(
            functools.partial(k_chunk, c=c, co=co, nch=nch),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, H, W, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W, co), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, co), v.dtype),
            scratch_shapes=[pltpu.VMEM((H, W, 9 * c), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        )(v, wk)
    try:
        ref = np.asarray(conv2d(xw, k, padding=1, padding_mode='reflect')).astype(np.float32)
        out = np.asarray(jax.jit(f)(xw)).astype(np.float32)
        err = np.abs(out - ref).max()
        print(f'chunked {cin}->{co}: {slope_ms(f, xw):.3f} ms (err {err:.4f})')
    except Exception as e:
        print(f'chunked {cin}->{co}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:110]}')
