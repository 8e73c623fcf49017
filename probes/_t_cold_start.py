"""Cold vs warm start through the axon relay (VERDICT r2 item 3): time the
big-lama 512² b16 predict-program build (trace + compile + first execute)
with the persistent compilation cache wired. Run in a FRESH process per
measurement: first run = cold, second = warm if the cache survives the
relay's remote-compile path.

Usage: python probes/_t_cold_start.py <cache_dir>
Prints one JSON line {"compile_s": ..., "cache_entries": N}.
"""
import glob
import json
import sys
import time

import numpy as np


def main():
    cache_dir = sys.argv[1]
    from lama_tpu.utils import enable_compilation_cache
    used = enable_compilation_cache(cache_dir)
    assert used == cache_dir, used

    import jax
    import jax.numpy as jnp
    from lama_tpu.models.ffc import FFCResNetGenerator

    gen = FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=3, n_blocks=18,
        add_out_act='sigmoid', dtype=jnp.bfloat16,
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(16, 512, 512, 4).astype(np.float32))
    variables = jax.jit(lambda k, xx: gen.init(k, xx, train=False))(
        jax.random.PRNGKey(0), x[:1])

    fwd = jax.jit(lambda v, xx: jnp.float32(
        jnp.sum(gen.apply(v, xx, train=False).astype(jnp.float32))))
    t0 = time.time()
    s = float(np.asarray(fwd(variables, x)))  # transfer forces completion
    dt = time.time() - t0
    print(json.dumps({'compile_s': round(dt, 1), 'sum': s,
                      'cache_entries': len(glob.glob(cache_dir + '/*'))}),
          flush=True)


if __name__ == '__main__':
    main()
