import os, sys
if 'cpu' in sys.argv:
    os.environ['JAX_PLATFORMS'] = 'cpu'
import numpy as np
import jax
import jax.numpy as jnp
if 'cpu' in sys.argv:
    jax.config.update('jax_platforms', 'cpu')
from lama_tpu.ops.conv import conv2d
from lama_tpu.ops.pallas.reflect_conv import reflect_out_conv7x7

interp = 'cpu' in sys.argv
rng = np.random.RandomState(0)
for (h, w, c, co) in [(128, 64, 64, 3), (256, 32, 64, 3), (16, 16, 8, 1)]:
    x = jnp.asarray(rng.rand(2, h, w, c).astype(np.float32))
    k = jnp.asarray((rng.randn(7, 7, c, co) * 0.05).astype(np.float32))
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    for b in (None, bias):
        ref = conv2d(x, k, bias=b, padding=3, padding_mode='reflect')
        out = reflect_out_conv7x7(x, k, bias=b, dtype=jnp.float32, interpret=interp)
        err = float(jnp.abs(out - ref).max())
        print(f'{h}x{w} {c}->{co} bias={b is not None}: maxerr {err:.6f}')
