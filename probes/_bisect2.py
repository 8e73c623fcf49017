import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 16, 64, 64, 128
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)

def reflect_pad_hw(v, p):
    h, w = v.shape[0], v.shape[1]
    rows_t = [v[j + 1:j + 2] for j in range(p - 1, -1, -1)]
    rows_b = [v[h - 2 - j:h - 1 - j] for j in range(p)]
    v = jnp.concatenate(rows_t + [v] + rows_b, axis=0)
    cols_l = [v[:, j + 1:j + 2] for j in range(p - 1, -1, -1)]
    cols_r = [v[:, w - 2 - j:w - 1 - j] for j in range(p)]
    return jnp.concatenate(cols_l + [v] + cols_r, axis=1)

def try_one(name, fn, out_shape):
    try:
        out = pl.pallas_call(
            fn, grid=(B,),
            in_specs=[pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1,) + out_shape, lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B,) + out_shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))(x)
        np.asarray(jnp.sum(out.astype(jnp.float32)))
        print(f'{name}: OK')
        return np.asarray(out)
    except Exception as e:
        print(f'{name}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:120]}')
        return None

def band3(x_ref, o_ref):
    p = reflect_pad_hw(x_ref[0], 1)
    o_ref[0] = jnp.concatenate([p[:, kx:kx + W, :] for kx in range(3)], axis=-1)
out_b = try_one('band3', band3, (H + 2, W, 3 * C))

def cols9b(x_ref, o_ref):
    p = reflect_pad_hw(x_ref[0], 1)
    band = jnp.concatenate([p[:, kx:kx + W, :] for kx in range(3)], axis=-1)
    o_ref[0] = jnp.concatenate([band[ky:ky + H] for ky in range(3)], axis=-1)
out_c = try_one('cols9b', cols9b, (H, W, 9 * C))

if out_c is not None:
    a = np.asarray(x[0]).astype(np.float32)
    pa = np.pad(a, ((1, 1), (1, 1), (0, 0)), mode='reflect')
    ref = np.concatenate([np.concatenate(
        [pa[ky:ky + H, kx:kx + W] for kx in range(3)], -1) for ky in range(3)], -1)
    print('cols9b correct:', np.allclose(out_c[0].astype(np.float32), ref, atol=1e-2))
