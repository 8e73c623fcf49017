"""Round-4 attribution of the int8 serving program (VERDICT r3 item 1).

The round-2 per-stage segmentation was for bf16 (BASELINE.md); after int8
shrank the eligible convs the split is unknown. Times the bench forward
(512², batch 16, 10-chain scan — bench.py methodology) under INT8_SERVING
for surgical variants:

  full           the headline int8 program (baseline)
  spectral_skip  FourierUnit replaced by identity -> spectral-slice upper bound
  no_blocks      n_blocks=0 -> stem/downs/ups/out residue
  pad_zero       every reflect pad treated as zero pad (bf16 convs via
                 PAD_PROBE_ZERO_MIN_H=0 + int8 convs via quant.ZERO_PAD_SERVING)
                 -> total reflect-pad tax under int8
  spectral_int8  the SPECTRAL_INT8 measured-quality lever (frequency 1x1 conv
                 on the int8 MXU) -> candidate win, quality gated separately

Attribution: spectral slice = full - spectral_skip; non-spectral bottleneck
= spectral_skip - no_blocks; rest = no_blocks (all modulo XLA overlap).

Run: timeout 3000 python probes/_t_int8_profile.py [variants,comma,list]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.models import ffc as ffc_mod
from lama_tpu.models.ffc import FFCResNetGenerator
from lama_tpu.ops import conv as conv_mod
from lama_tpu.ops import quant
from lama_tpu.utils import enable_compilation_cache

BATCH, SIZE, CHAIN, REPEATS = 16, 512, 10, 4


def build(n_blocks=18):
    return FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=3, n_blocks=n_blocks,
        add_out_act='sigmoid', dtype=jnp.bfloat16,
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))


def time_variant(name, gen, variables, img, mask):
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
    ref = np.asarray(fn(variables, img, mask))
    print(f'{name}: compile+first {time.perf_counter() - t0:.1f}s '
          f'mean={ref[0, 0]:.5f}', flush=True)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(fn(variables, img, mask))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / CHAIN
    print(f'{name}: {dt * 1000:.1f} ms/iter -> {BATCH / dt:.1f} img/s '
          f'(times {[round(t, 2) for t in times]})', flush=True)
    return dt * 1000


def main():
    enable_compilation_cache()
    only = set(sys.argv[1].split(',')) if len(sys.argv) > 1 else None

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32))
    mask = jnp.zeros((BATCH, SIZE, SIZE, 1), jnp.float32)
    mask = mask.at[:, SIZE // 4: SIZE // 2, SIZE // 4: SIZE // 2, :].set(1.0)
    x0 = jnp.concatenate([img * (1 - mask), mask], axis=-1)

    gen = build()
    variables = jax.jit(lambda k, x: gen.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)

    quant.INT8_SERVING = True
    results = {}
    try:
        if only is None or 'full' in only:
            results['full'] = time_variant('full', gen, variables, img, mask)

        if only is None or 'spectral_skip' in only:
            ffc_mod.SPECTRAL_SKIP = True
            try:
                results['spectral_skip'] = time_variant(
                    'spectral_skip', gen, variables, img, mask)
            finally:
                ffc_mod.SPECTRAL_SKIP = False

        if only is None or 'no_blocks' in only:
            gen0 = build(n_blocks=0)
            v0 = jax.jit(lambda k, x: gen0.init(k, x, train=False))(
                jax.random.PRNGKey(0), x0)
            results['no_blocks'] = time_variant('no_blocks', gen0, v0, img, mask)

        if only is None or 'pad_zero' in only:
            conv_mod.PAD_PROBE_ZERO_MIN_H = 0
            quant.ZERO_PAD_SERVING = True
            try:
                results['pad_zero'] = time_variant('pad_zero', gen, variables,
                                                   img, mask)
            finally:
                conv_mod.PAD_PROBE_ZERO_MIN_H = None
                quant.ZERO_PAD_SERVING = False

        if only is not None and 'pad_zero_bf16' in only:
            # pads of the NON-quantized (bf16) convs only — the stem/out/
            # spectral-adjacent convs where the bf16-era +5% lived
            conv_mod.PAD_PROBE_ZERO_MIN_H = 0
            try:
                results['pad_zero_bf16'] = time_variant(
                    'pad_zero_bf16', gen, variables, img, mask)
            finally:
                conv_mod.PAD_PROBE_ZERO_MIN_H = None

        if only is not None and 'pad_zero_int8' in only:
            # pads of the QUANTIZED convs only (int8-domain gather -> fused
            # zero pad)
            quant.ZERO_PAD_SERVING = True
            try:
                results['pad_zero_int8'] = time_variant(
                    'pad_zero_int8', gen, variables, img, mask)
            finally:
                quant.ZERO_PAD_SERVING = False

        if only is None or 'spectral_int8' in only:
            ffc_mod.SPECTRAL_INT8 = True
            try:
                results['spectral_int8'] = time_variant(
                    'spectral_int8', gen, variables, img, mask)
            finally:
                ffc_mod.SPECTRAL_INT8 = False

        if only is not None and ({'headline', 'bf16_store', 'headline_skip'}
                                 & only):
            # the shipped round-4 headline: int8 + STATIC calibrated scales +
            # zero-padded quantized convs — the program bench.py times
            from lama_tpu.serving import calibrate_int8
            from lama_tpu.ops import spectral as spectral_mod
            quant.ZERO_PAD_SERVING = True
            try:
                v_static = calibrate_int8(gen, variables,
                                          [(np.asarray(img), np.asarray(mask))])
                if 'headline' in only:
                    results['headline'] = time_variant(
                        'headline', gen, v_static, img, mask)
                if 'headline_skip' in only:
                    ffc_mod.SPECTRAL_SKIP = True
                    try:
                        results['headline_skip'] = time_variant(
                            'headline_skip', gen, v_static, img, mask)
                    finally:
                        ffc_mod.SPECTRAL_SKIP = False
                if 'bf16_store' in only:
                    # measured-quality lever: bf16-stored DFT intermediates
                    # (ops/spectral.py::BF16_STORE) on top of the headline
                    spectral_mod.BF16_STORE = True
                    try:
                        results['bf16_store'] = time_variant(
                            'bf16_store', gen, v_static, img, mask)
                    finally:
                        spectral_mod.BF16_STORE = False
            finally:
                quant.ZERO_PAD_SERVING = False

        if only is not None and 's2d_stem' in only:
            # one re-measure of the stem a=2 s2d case under the round-4
            # program (bf16-era in-graph: 114.8 vs 129.6 = big negative;
            # the out-head case inverted, the stem case gets one look too).
            # OUT_HEAD_ONLY stays False and the down convs are quantized
            # (never reach the s2d dispatch), so USE_S2D_CONV here fires on
            # stem AND out head; compare against s2d_out to isolate the stem.
            from lama_tpu.serving import calibrate_int8
            from lama_tpu.ops import spectral as spectral_mod
            quant.ZERO_PAD_SERVING = True
            spectral_mod.BF16_STORE = True
            conv_mod.USE_S2D_CONV = True
            try:
                v_static = calibrate_int8(gen, variables,
                                          [(np.asarray(img), np.asarray(mask))])
                results['s2d_stem'] = time_variant(
                    's2d_stem', gen, v_static, img, mask)
            finally:
                conv_mod.USE_S2D_CONV = False
                spectral_mod.BF16_STORE = False
                quant.ZERO_PAD_SERVING = False

        if only is not None and 's2d_out' in only:
            # re-measure of the round-2 in-graph NEGATIVE under the ROUND-4
            # program (int8 + static + zero-pad + bf16 store): s2d transform
            # on the OUT HEAD ONLY (isolated win was 23.0 -> 17.7 ms; the
            # bf16-era in-graph composition lost to fusion breaks — but
            # zero-pad proved signs can flip when the program changes)
            from lama_tpu.serving import calibrate_int8
            from lama_tpu.ops import spectral as spectral_mod
            from lama_tpu.ops import s2d_conv as s2d_mod
            orig_factor = s2d_mod.s2d_factor_for
            quant.ZERO_PAD_SERVING = True
            spectral_mod.BF16_STORE = True
            conv_mod.USE_S2D_CONV = True
            s2d_mod.s2d_factor_for = (
                lambda h, w, c, c_out, k, s:
                8 if (k == 7 and s == 1 and c_out <= 8 and h >= 256
                      and h % 16 == 0 and w % 16 == 0) else None)
            # conv.py resolved s2d_factor_for at import time? no — it
            # imports inside the branch per call, so the patch takes effect
            try:
                v_static = calibrate_int8(gen, variables,
                                          [(np.asarray(img), np.asarray(mask))])
                results['s2d_out'] = time_variant(
                    's2d_out', gen, v_static, img, mask)
            finally:
                s2d_mod.s2d_factor_for = orig_factor
                conv_mod.USE_S2D_CONV = False
                spectral_mod.BF16_STORE = False
                quant.ZERO_PAD_SERVING = False
    finally:
        quant.INT8_SERVING = False

    if {'full', 'spectral_skip', 'no_blocks'} <= set(results):
        f, s, r = (results['full'], results['spectral_skip'],
                   results['no_blocks'])
        print(f'\nattribution (ms/batch, modulo overlap): '
              f'spectral={f - s:.1f} nonspectral_bottleneck={s - r:.1f} '
              f'rest={r:.1f} total={f:.1f}', flush=True)
    print({k: round(v, 1) for k, v in results.items()}, flush=True)


if __name__ == '__main__':
    main()
