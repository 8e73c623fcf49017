"""Probe: does the int8 serving batch-size peak move off bf16's b16?

bf16 sweep (BASELINE.md round 2, concat layout): b8 127.7 / b16 144.5 (peak)
/ b24 138.2 img/s — b16 won on HBM capacity pressure from 512² activations.
int8 shrinks conv time but NOT activation residency (activations stay bf16),
so the prior is that b16 stays the peak; this measures it.

Run: PYTHONPATH=/root/repo timeout 3000 python -u probes/_t_int8_batch.py
     [headline]
`headline` re-sweeps under the FULL round-4 mode (static scales + zero-pad
+ bf16 spectral store + s2d out head) — every win shifted the
compute/bandwidth mix, so the bf16-era b16 peak gets one re-check.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.models.ffc import FFCResNetGenerator
from lama_tpu.ops import quant
from lama_tpu.utils import enable_compilation_cache

SIZE, CHAIN, REPEATS = 512, 10, 3
BATCHES = (8, 16, 24)


def main():
    enable_compilation_cache()
    quant.INT8_SERVING = True
    headline = len(sys.argv) > 1 and sys.argv[1] == 'headline'
    if headline:
        from lama_tpu.ops import conv as conv_mod
        from lama_tpu.ops import s2d_conv, spectral
        quant.ZERO_PAD_SERVING = True
        spectral.BF16_STORE = True
        conv_mod.USE_S2D_CONV = True
        s2d_conv.OUT_HEAD_ONLY = True
    gen = FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=3, n_blocks=18,
        add_out_act='sigmoid', dtype=jnp.bfloat16,
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(1, SIZE, SIZE, 4).astype(np.float32))
    variables = jax.jit(lambda k, x: gen.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)

    def chain(variables, img, mask):
        def body(carry, _):
            x = jnp.concatenate([carry * (1 - mask), mask], axis=-1)
            pred = gen.apply(variables, x, train=False)
            out = mask * pred + (1 - mask) * carry
            return out.astype(jnp.float32), out.mean()
        _, means = jax.lax.scan(body, img, jnp.arange(CHAIN))
        return means.mean().reshape(1, 1)

    for batch in BATCHES:
        img = jnp.asarray(rng.rand(batch, SIZE, SIZE, 3).astype(np.float32))
        mask = jnp.zeros((batch, SIZE, SIZE, 1), jnp.float32)
        mask = mask.at[:, SIZE // 4: SIZE // 2, SIZE // 4: SIZE // 2, :].set(1.0)
        if headline:  # static scales, calibrated per batch shape (scalars
            # only — the compiled program matches bench.py's)
            from lama_tpu.serving import calibrate_int8
            variables = calibrate_int8(
                gen, {'params': variables['params'],
                      'batch_stats': variables['batch_stats']},
                [(np.asarray(img), np.asarray(mask))])
        fn = jax.jit(chain)
        t0 = time.perf_counter()
        np.asarray(fn(variables, img, mask))
        print(f'b{batch}: compile+first {time.perf_counter()-t0:.1f}s', flush=True)
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            np.asarray(fn(variables, img, mask))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) / CHAIN
        print(f'b{batch}: {dt*1000:.1f} ms/iter -> {batch/dt:.1f} img/s '
              f'(times {[round(t,2) for t in times]})', flush=True)
    quant.INT8_SERVING = False


if __name__ == '__main__':
    main()
