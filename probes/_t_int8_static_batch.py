"""Probe: batch-size sweep for int8 serving WITH calibrated static scales.

bf16 sweep history (BASELINE.md): b8 127.7 / b16 144.5 (peak) / b24 138.2.
int8 shrinks conv time but not bf16 activation residency, so the prior is
b16 stays the peak. Static scales are batch-agnostic scalars, so ONE
calibration (at b16) serves every batch size — only the chain programs
differ per batch.

Run: PYTHONPATH=/root/repo timeout 3000 python -u probes/_t_int8_static_batch.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.models.ffc import FFCResNetGenerator
from lama_tpu.ops import quant
from lama_tpu.serving import calibrate_int8
from lama_tpu.utils import enable_compilation_cache

SIZE, CHAIN, REPEATS = 512, 10, 3
BATCHES = (8, 16, 24)


def main():
    enable_compilation_cache()
    gen = FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=3, n_blocks=18,
        add_out_act='sigmoid', dtype=jnp.bfloat16,
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))

    rng = np.random.RandomState(0)

    def make_batch(b):
        img = jnp.asarray(rng.rand(b, SIZE, SIZE, 3).astype(np.float32))
        mask = jnp.zeros((b, SIZE, SIZE, 1), jnp.float32)
        mask = mask.at[:, SIZE // 4: SIZE // 2, SIZE // 4: SIZE // 2, :].set(1.0)
        return img, mask

    img16, mask16 = make_batch(16)
    x0 = jnp.concatenate([img16 * (1 - mask16), mask16], axis=-1)
    variables = jax.jit(lambda k, x: gen.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)

    quant.INT8_SERVING = True
    t0 = time.perf_counter()
    variables = calibrate_int8(gen, variables, [(img16, mask16)])
    print(f'calibrated in {time.perf_counter()-t0:.1f}s', flush=True)

    for b in BATCHES:
        img, mask = (img16, mask16) if b == 16 else make_batch(b)

        def chain(variables, img, mask):
            def body(carry, _):
                x = jnp.concatenate([carry * (1 - mask), mask], axis=-1)
                pred = gen.apply(variables, x, train=False)
                out = mask * pred + (1 - mask) * carry
                return out.astype(jnp.float32), out.mean()
            _, means = jax.lax.scan(body, img, jnp.arange(CHAIN))
            return means.mean().reshape(1, 1)

        fn = jax.jit(chain)
        t0 = time.perf_counter()
        np.asarray(fn(variables, img, mask))
        print(f'b{b}: compile+first {time.perf_counter()-t0:.1f}s', flush=True)
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            np.asarray(fn(variables, img, mask))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) / CHAIN
        print(f'b{b}: {dt*1000:.1f} ms/iter -> {b/dt:.1f} img/s '
              f'(times {[round(t,2) for t in times]})', flush=True)
    quant.INT8_SERVING = False


if __name__ == '__main__':
    main()
