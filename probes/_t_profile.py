import glob, gzip, json, os
import numpy as np
import jax
import jax.numpy as jnp
from lama_tpu.models.ffc import FFCResNetGenerator

gen = FFCResNetGenerator(input_nc=4, output_nc=3, ngf=64, n_downsampling=3,
                         n_blocks=18, add_out_act='sigmoid',
                         resnet_conv_kwargs={'ratio_gin': 0.75, 'ratio_gout': 0.75},
                         downsample_conv_kwargs={'ratio_gin': 0, 'ratio_gout': 0},
                         dtype=jnp.bfloat16)
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (16, 512, 512, 4), jnp.float32).astype(jnp.bfloat16)
vs = jax.eval_shape(lambda: gen.init(key, x, train=False))
import flax
vs = gen.init(key, x, train=False)
fwd = jax.jit(lambda v, xx: gen.apply(v, xx, train=False))
out = fwd(vs, x); np.asarray(jnp.sum(out.astype(jnp.float32)))
os.makedirs('/tmp/jaxtrace', exist_ok=True)
try:
    with jax.profiler.trace('/tmp/jaxtrace'):
        for _ in range(3):
            out = fwd(vs, x)
        np.asarray(jnp.sum(out.astype(jnp.float32)))
    print('trace captured')
except Exception as e:
    print('trace failed:', type(e).__name__, str(e)[:200])
files = glob.glob('/tmp/jaxtrace/**/*.trace.json.gz', recursive=True)
print('files:', files)
