"""Round-3 spectral variants (VERDICT r2 item 2), measured in-graph on the
big-lama 512² bf16 batch-16 forward (bench.py methodology):

  S  = STACKED_DFT       (ops/spectral.py: output-axis-stacked DFT matrices,
                          N 33->66 / 64->128, 12 einsums -> 7, no repacks)
  F  = SPECTRAL_FOLD_BN  (models/ffc.py: eval-time BN fold into the 1x1
                          frequency conv)

Baseline = current defaults (SPECTRAL_CONCAT_LAYOUT on). Both variants are
parity-tested exact on CPU (tests/test_spectral.py). This probe decides the
defaults.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.models import ffc as ffc_mod
from lama_tpu.models.ffc import FFCResNetGenerator
from lama_tpu.ops import spectral
from lama_tpu.utils import enable_compilation_cache

BATCH, SIZE, CHAIN, REPEATS = 16, 512, 10, 3


def build():
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
    return gen, variables, img, mask


def measure(gen, variables, img, mask, tag):
    @jax.jit
    def chain(variables, img, mask):
        def body(carry, _):
            x = jnp.concatenate([carry * (1 - mask), mask], axis=-1)
            pred = gen.apply(variables, x, train=False)
            out = mask * pred + (1 - mask) * carry
            return out.astype(jnp.float32), out.mean()
        _, means = jax.lax.scan(body, img, jnp.arange(CHAIN))
        return means.mean().reshape(1, 1)

    t0 = time.perf_counter()
    np.asarray(chain(variables, img, mask))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(chain(variables, img, mask))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / CHAIN
    print(f'[{tag}] {BATCH/dt:.1f} img/s  ({dt*1000:.1f} ms/batch; '
          f'compile {compile_s:.0f}s)', flush=True)
    return BATCH / dt


if __name__ == '__main__':
    enable_compilation_cache()
    gen, variables, img, mask = build()
    results = {}
    for combo in [(), ('S',), ('F',), ('S', 'F')]:
        spectral.STACKED_DFT = 'S' in combo
        ffc_mod.SPECTRAL_FOLD_BN = 'F' in combo
        tag = '+'.join(combo) or 'baseline'
        results[tag] = measure(gen, variables, img, mask, tag)
    base = results['baseline']
    for tag, v in results.items():
        print(f'{tag}: {v:.1f} img/s ({(v / base - 1) * 100:+.1f}%)', flush=True)
