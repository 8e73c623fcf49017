"""Scan-chained micro-bench of conv formulations at FFC block shapes + Mosaic
crash bisection for the im2col kernel pieces. Scratch file, not committed."""
import functools
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lama_tpu.ops.conv import conv2d
from lama_tpu.ops.pallas.halo_conv import _kernel as tap_kernel

B, H, W = 16, 64, 64
N_ITER = 20


def chain_bench(op, x, iters=N_ITER):
    """Time op(x) repeated with forced sequential dependency via scalar carry."""
    def body(carry, _):
        o = op(x + carry.astype(x.dtype))
        return jnp.sum(o.astype(jnp.float32)) * 0.0, None

    f = jax.jit(lambda x0: jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=iters)[0])
    np.asarray(f(x))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(f(x))
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3


def reflect_pad_hw(v, p):
    h, w = v.shape[0], v.shape[1]
    rows_t = [v[j + 1:j + 2] for j in range(p - 1, -1, -1)]
    rows_b = [v[h - 2 - j:h - 1 - j] for j in range(p)]
    v = jnp.concatenate(rows_t + [v] + rows_b, axis=0)
    cols_l = [v[:, j + 1:j + 2] for j in range(p - 1, -1, -1)]
    cols_r = [v[:, w - 2 - j:w - 1 - j] for j in range(p)]
    return jnp.concatenate(cols_l + [v] + cols_r, axis=1)


def pallas_conv(kernel_fn, x, wk, co, extra_vmem=100):
    c = x.shape[-1]
    return pl.pallas_call(
        kernel_fn,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=extra_vmem * 1024 * 1024),
    )(x, wk)


# ---- bisection kernels (run with mode=bisect) ----
def bis_pad_only(x_ref, o_ref):
    o_ref[0] = reflect_pad_hw(x_ref[0], 1)


def bis_band(x_ref, o_ref):
    p = reflect_pad_hw(x_ref[0], 1)
    h, w, c = x_ref.shape[1:]
    band = jnp.concatenate([p[:, kx:kx + w, :] for kx in range(3)], axis=-1)
    o_ref[0] = band


def bis_cols9(x_ref, o_ref):
    p = reflect_pad_hw(x_ref[0], 1)
    h, w, c = x_ref.shape[1:]
    cols = jnp.concatenate(
        [p[ky:ky + h, kx:kx + w, :] for ky in range(3) for kx in range(3)],
        axis=-1)
    o_ref[0] = cols


def bis_bigdot(x_ref, w_ref, o_ref):
    # (H, W, 9C) x (9C, Co) minor contraction with large K
    acc = jax.lax.dot_general(x_ref[0].astype(jnp.bfloat16),
                              w_ref[...].astype(jnp.bfloat16),
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def run_bisect():
    rng = np.random.RandomState(0)
    c, co = 128, 128
    x = jnp.asarray(rng.rand(B, H, W, c).astype(np.float32)).astype(jnp.bfloat16)

    def try_one(name, fn, out_c, in2=None):
        try:
            specs = [pl.BlockSpec((1, H, W, x.shape[-1] if in2 is None else in2[0]),
                                  lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)]
            args = [x]
            if in2 is not None:
                specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
                args.append(in2[1])
                specs[0] = pl.BlockSpec((1, H, W, in2[0]), lambda i: (i, 0, 0, 0),
                                        memory_space=pltpu.VMEM)
                args[0] = jnp.asarray(rng.rand(B, H, W, in2[0]).astype(np.float32)).astype(jnp.bfloat16)
            hw = (H + 2, W + 2) if name == 'pad' else (H, W)
            out = pl.pallas_call(
                fn, grid=(B,),
                in_specs=specs,
                out_specs=pl.BlockSpec((1, hw[0], hw[1], out_c),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, hw[0], hw[1], out_c), x.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024))(*args)
            np.asarray(jnp.sum(out.astype(jnp.float32)))
            print(f'{name}: OK')
        except Exception as e:
            print(f'{name}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:120]}')

    try_one('pad', bis_pad_only, c)
    try_one('band3', bis_band, 3 * c)
    try_one('cols9', bis_cols9, 9 * c)
    wk = jnp.asarray((rng.randn(9 * c, co) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    xc = jnp.asarray(rng.rand(B, H, W, 9 * c).astype(np.float32)).astype(jnp.bfloat16)

    def bigdot_wrap(x_ref, w_ref, o_ref):
        bis_bigdot(x_ref, w_ref, o_ref)
    try:
        out = pl.pallas_call(
            bigdot_wrap, grid=(B,),
            in_specs=[pl.BlockSpec((1, H, W, 9 * c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W, co), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, co), xc.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))(xc, wk)
        np.asarray(jnp.sum(out.astype(jnp.float32)))
        print('bigdot: OK')
    except Exception as e:
        print(f'bigdot: FAIL {type(e).__name__}: {str(e).splitlines()[0][:120]}')


def run_bench():
    rng = np.random.RandomState(0)
    for c, co in [(128, 128), (384, 128), (128, 384)]:
        x = jnp.asarray(rng.rand(B, H, W, c).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray((rng.randn(3, 3, c, co) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
        rows = []
        rows.append(('A zero', chain_bench(lambda v: conv2d(v, k, padding=1), x)))
        rows.append(('B reflect', chain_bench(
            lambda v: conv2d(v, k, padding=1, padding_mode='reflect'), x)))
        tk = functools.partial(tap_kernel, dtype=jnp.bfloat16)
        rows.append(('C tap', chain_bench(lambda v: pallas_conv(tk, v, k, co), x)))
        print(f'C={c} Co={co}: ' + ' | '.join(f'{n}: {ms:.3f} ms' for n, ms in rows))


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'bench'
    if mode == 'bisect':
        run_bisect()
    else:
        run_bench()
