"""Probe: int8 serving path (ops/quant.py) vs bf16 on the real chip.

Times the big-lama bench forward (512^2, batch 16, 10-chain scan — the exact
bench.py methodology) with quant.INT8_SERVING on vs off, in one process.
The flag is read at trace time, so each variant gets its own jit wrapper and
is traced while the flag holds its value.

Run: timeout 3000 python probes/_t_int8.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.models.ffc import FFCResNetGenerator
from lama_tpu.ops import quant
from lama_tpu.utils import enable_compilation_cache

BATCH, SIZE, CHAIN, REPEATS = 16, 512, 10, 4


def main():
    enable_compilation_cache()
    gen = FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=3, n_blocks=18,
        add_out_act='sigmoid', dtype=jnp.bfloat16,
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32))
    mask = jnp.zeros((BATCH, SIZE, SIZE, 1), jnp.float32)
    mask = mask.at[:, SIZE // 4: SIZE // 2, SIZE // 4: SIZE // 2, :].set(1.0)
    x0 = jnp.concatenate([img * (1 - mask), mask], axis=-1)
    variables = jax.jit(lambda k, x: gen.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)

    def make_chain():
        # a FRESH function object per variant: jax.jit caches by function
        # identity, and INT8_SERVING is a trace-time flag — reusing the same
        # `chain` across variants would silently reuse the first trace
        def chain(variables, img, mask):
            def body(carry, _):
                x = jnp.concatenate([carry * (1 - mask), mask], axis=-1)
                pred = gen.apply(variables, x, train=False)
                out = mask * pred + (1 - mask) * carry
                return out.astype(jnp.float32), out.mean()
            _, means = jax.lax.scan(body, img, jnp.arange(CHAIN))
            return means.mean().reshape(1, 1)
        return chain

    for name, flag in (('bf16', False), ('int8', True)):
        quant.INT8_SERVING = flag
        fn = jax.jit(make_chain())
        t0 = time.perf_counter()
        ref = np.asarray(fn(variables, img, mask))
        print(f'{name}: compile+first {time.perf_counter()-t0:.1f}s '
              f'mean={ref[0,0]:.5f}', flush=True)
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            np.asarray(fn(variables, img, mask))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) / CHAIN
        print(f'{name}: {dt*1000:.1f} ms/iter -> {BATCH/dt:.1f} img/s '
              f'(times {[round(t,2) for t in times]})', flush=True)
    quant.INT8_SERVING = False


if __name__ == '__main__':
    main()
