import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update('jax_platforms', 'cpu')
from lama_tpu.ops.conv import conv2d
from lama_tpu.ops.pallas.reflect_conv import (reflect_conv3x3_cols,
                                              reflect_down_conv3x3)

rng = np.random.RandomState(0)
# kernel 1
x = jnp.asarray(rng.rand(2, 16, 16, 128).astype(np.float32))
k = jnp.asarray((rng.randn(3, 3, 128, 128) * 0.05).astype(np.float32))
bias = jnp.asarray(rng.randn(128).astype(np.float32))
ref = conv2d(x, k, bias=bias, padding=1, padding_mode='reflect')
out = reflect_conv3x3_cols(x, k, bias=bias, dtype=jnp.float32, interpret=True)
print('cols maxerr:', float(jnp.abs(out - ref).max()))

# kernel 2: down conv across shapes
for (h, w, c, co) in [(128, 128, 64, 128), (64, 64, 128, 256), (64, 32, 256, 512), (64, 64, 64, 128)]:
    x = jnp.asarray(rng.rand(2, h, w, c).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, c, co) * 0.05).astype(np.float32))
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    ref = conv2d(x, k, bias=bias, stride=2, padding=1, padding_mode='reflect')
    out = reflect_down_conv3x3(x, k, bias=bias, dtype=jnp.float32, interpret=True)
    err = float(jnp.abs(out - ref).max())
    print(f'down {h}x{w} {c}->{co}: shape {out.shape} vs {ref.shape} maxerr {err:.6f}')
