"""Probe: int8 serving with STATIC (calibrated) activation scales vs the
dynamic per-conv amax path, on the real chip.

Hypothesis: the dynamic per-tensor amax is a full-tensor reduction that
serializes before each quantized conv's elementwise quantize (two reads of
the activation); a calibrated scalar makes the quantize a pure elementwise
op XLA can fuse into the producer's epilogue, saving one HBM pass per
quantized conv (~91 sites in big-lama).

Methodology: bench.py scan-chain (512^2, batch 16, 10-chain), one process.
Run: timeout 3000 python probes/_t_int8_static.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.models.ffc import FFCResNetGenerator
from lama_tpu.ops import quant
from lama_tpu.serving import calibrate_int8
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

    quant.INT8_SERVING = True
    t0 = time.perf_counter()
    calibrated = calibrate_int8(gen, variables, [(img, mask)])
    n = len(jax.tree_util.tree_leaves(calibrated['quant_stats']))
    print(f'calibrated {n} conv sites in {time.perf_counter()-t0:.1f}s',
          flush=True)

    def make_chain():
        # fresh function object per variant (jit caches by identity)
        def chain(variables, img, mask):
            def body(carry, _):
                x = jnp.concatenate([carry * (1 - mask), mask], axis=-1)
                pred = gen.apply(variables, x, train=False)
                out = mask * pred + (1 - mask) * carry
                return out.astype(jnp.float32), out.mean()
            _, means = jax.lax.scan(body, img, jnp.arange(CHAIN))
            return means.mean().reshape(1, 1)
        return chain

    for name, v in (('int8-dynamic', variables), ('int8-static', calibrated)):
        fn = jax.jit(make_chain())
        t0 = time.perf_counter()
        ref = np.asarray(fn(v, img, mask))
        print(f'{name}: compile+first {time.perf_counter()-t0:.1f}s '
              f'mean={ref[0,0]:.5f}', flush=True)
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            np.asarray(fn(v, img, mask))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) / CHAIN
        print(f'{name}: {dt*1000:.1f} ms/iter -> {BATCH/dt:.1f} img/s '
              f'(times {[round(t,2) for t in times]})', flush=True)
    quant.INT8_SERVING = False


if __name__ == '__main__':
    main()
