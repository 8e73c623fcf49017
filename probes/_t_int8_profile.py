"""Attribution of the int8 serving program (VERDICT r3 item 1, extended
round 5 for VERDICT r4 item 3 under the full headline mode).

Times the bench forward (512², batch 16, 10-chain scan — bench.py
methodology) for surgical variants. Round-5 port: serving levers are a
static ServingMode on the generator (ops/serving_mode.py), so variants are
separate module instances — no ambient flags (probe-only globals
SPECTRAL_SKIP / SPECTRAL_INT8 / PAD_PROBE_ZERO_MIN_H remain in
models/ffc.py / ops/conv.py by design: they are not serving options).

Base variants (dynamic-scale int8, the round-4 r3-era baseline):
  full           the int8 program
  spectral_skip  FourierUnit -> identity: spectral-slice upper bound
  no_blocks      n_blocks=0 -> stem/downs/ups/out residue
  spectral_int8  frequency 1x1 conv on the int8 MXU (measured -4.4%)

Headline variants (int8 + STATIC scales + zero-pad + bf16 store + s2d out
head = the bench.py program):
  headline           the shipped program (baseline for round-5 levers)
  headline_skip      + SPECTRAL_SKIP -> headline spectral slice
  headline_noblocks  n_blocks=0 under the headline mode -> the "rest" slice

Attribution: spectral = headline - headline_skip; nonspectral bottleneck
= headline_skip - headline_noblocks; rest = headline_noblocks (modulo XLA
overlap). The per-stage split of the rest slice (stem/downs/ups/out/
composite) is probes/_t_rest_iso.py (isolated-stage slope timing).

Run: timeout 3000 python probes/_t_int8_profile.py [variants,comma,list]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lama_tpu.models import ffc as ffc_mod
from lama_tpu.models.ffc import FFCResNetGenerator
from lama_tpu.ops.serving_mode import ServingMode
from lama_tpu.utils import enable_compilation_cache

BATCH, SIZE, CHAIN, REPEATS = 16, 512, 10, 4

INT8 = ServingMode(int8=True)
HEADLINE = ServingMode(int8=True, zero_pad=True, spectral_bf16_store=True,
                       s2d='out_head')


def build(n_blocks=18, mode=INT8, **kw):
    return FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=3, n_blocks=n_blocks,
        add_out_act='sigmoid', dtype=jnp.bfloat16, mode=mode,
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75,
                                enable_lfu=False),
        **kw)


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
    results = {}

    def want(*names):
        return only is None or (set(names) & only)

    if want('full'):
        results['full'] = time_variant('full', gen, variables, img, mask)

    if want('spectral_skip'):
        ffc_mod.SPECTRAL_SKIP = True
        try:
            results['spectral_skip'] = time_variant(
                'spectral_skip', gen, variables, img, mask)
        finally:
            ffc_mod.SPECTRAL_SKIP = False

    if want('no_blocks'):
        gen0 = build(n_blocks=0)
        v0 = jax.jit(lambda k, x: gen0.init(k, x, train=False))(
            jax.random.PRNGKey(0), x0)
        results['no_blocks'] = time_variant('no_blocks', gen0, v0, img, mask)

    if only is not None and 'spectral_int8' in only:
        ffc_mod.SPECTRAL_INT8 = True
        try:
            results['spectral_int8'] = time_variant(
                'spectral_int8', gen, variables, img, mask)
        finally:
            ffc_mod.SPECTRAL_INT8 = False

    # ---- headline-mode family: the shipped bench.py program ---------------
    if want('headline', 'headline_skip', 'headline_noblocks', 'bf16_store'):
        from lama_tpu.serving import calibrate_int8
        gen_h = build(mode=HEADLINE)
        v_static = calibrate_int8(gen_h, variables,
                                  [(np.asarray(img), np.asarray(mask))])

        if want('headline', 'bf16_store'):
            results['headline'] = time_variant('headline', gen_h, v_static,
                                               img, mask)
        if want('headline_skip'):
            ffc_mod.SPECTRAL_SKIP = True
            try:
                results['headline_skip'] = time_variant(
                    'headline_skip', gen_h, v_static, img, mask)
            finally:
                ffc_mod.SPECTRAL_SKIP = False
        if want('headline_noblocks'):
            gen0 = build(n_blocks=0, mode=HEADLINE)
            v0 = jax.jit(lambda k, x: gen0.init(k, x, train=False))(
                jax.random.PRNGKey(0), x0)
            v0 = calibrate_int8(gen0, v0,
                                [(np.asarray(img), np.asarray(mask))])
            results['headline_noblocks'] = time_variant(
                'headline_noblocks', gen0, v0, img, mask)

    if want('phase_vs_s2d') or want('head_phase'):
        # Round-5 out-head side-by-side under the headline mode, one process:
        # the new phase-conv dispatch (shipped) vs the round-4 s2d-domain
        # conv (reached by patching the phase entry point back).
        from lama_tpu.serving import calibrate_int8
        from lama_tpu.ops import s2d_conv as s2d_mod
        gen_h = build(mode=HEADLINE)
        v_static = calibrate_int8(gen_h, variables,
                                  [(np.asarray(img), np.asarray(mask))])
        results['head_phase'] = time_variant('head_phase', gen_h, v_static,
                                             img, mask)
    if want('phase_vs_s2d'):
        real_phase = s2d_mod.conv2d_reflect_phase
        s2d_mod.conv2d_reflect_phase = (
            lambda x, k, bias=None, a=8, padding_mode='reflect':
            s2d_mod.conv2d_reflect_s2d(x, k, bias=bias, stride=1, a=a,
                                       padding_mode=padding_mode))
        try:
            results['head_s2d'] = time_variant('head_s2d', gen_h, v_static,
                                               img, mask)
        finally:
            s2d_mod.conv2d_reflect_phase = real_phase

    if want('head_pad_zero'):
        # Bound the out-head reflect-pad residual (~4.3 ms isolated, phase
        # 6.90 vs phase_nopad 2.59): time the headline with the pad folded
        # into the conv as XLA-native ZERO padding (no pad tensor exists).
        # TIMING BOUND ONLY — border semantics wrong; if the in-graph gap is
        # real, the exact version recomputes the 3-px border strips with
        # reflect pad and pastes them (interior identical).
        import jax.lax as lax
        from lama_tpu.serving import calibrate_int8
        from lama_tpu.ops import s2d_conv as s2d_mod
        from lama_tpu.ops.s2d_conv import depth_to_space, pack_kernel_phase

        def phase_zero(x, kernel, bias=None, a=8, padding_mode='reflect'):
            p = kernel.shape[0] // 2
            wp = pack_kernel_phase(kernel, a)
            out = lax.conv_general_dilated(
                x, wp, (a, a), ((p, p), (p, p)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
            out = depth_to_space(out, a).astype(x.dtype)
            if bias is not None:
                out = out + bias.reshape(1, 1, 1, -1).astype(out.dtype)
            return out

        gen_z = build(mode=HEADLINE)
        v_z = calibrate_int8(gen_z, variables,
                             [(np.asarray(img), np.asarray(mask))])
        real_phase = s2d_mod.conv2d_reflect_phase
        s2d_mod.conv2d_reflect_phase = phase_zero
        try:
            results['head_pad_zero'] = time_variant('head_pad_zero', gen_z,
                                                    v_z, img, mask)
        finally:
            s2d_mod.conv2d_reflect_phase = real_phase

    if want('headline_xfold'):
        # Round-5 stem candidate IN-GRAPH: the kx-tap channel fold
        # (ops/s2d_conv.py::conv2d_reflect_xfold) under the full headline
        # program via ServingMode.xfold_stem — side-by-side with head_phase
        # (same process). Exact semantics; ship = xfold_stem=true.
        from lama_tpu.serving import calibrate_int8
        gen_x = build(mode=HEADLINE.but(xfold_stem=True))
        v_x = calibrate_int8(gen_x, variables,
                             [(np.asarray(img), np.asarray(mask))])
        results['headline_xfold'] = time_variant('headline_xfold', gen_x,
                                                 v_x, img, mask)

    if want('head_zsplit'):
        # The EXACT pad-free out head (zero-padded phase core + recomputed
        # reflect border strips, ops/s2d_conv.py::conv2d_reflect_phase_zsplit)
        # — the shippable version of the head_pad_zero bound.
        from lama_tpu.serving import calibrate_int8
        from lama_tpu.ops import s2d_conv as s2d_mod
        gen_z = build(mode=HEADLINE)
        v_z = calibrate_int8(gen_z, variables,
                             [(np.asarray(img), np.asarray(mask))])
        real_phase = s2d_mod.conv2d_reflect_phase
        s2d_mod.conv2d_reflect_phase = s2d_mod.conv2d_reflect_phase_zsplit
        try:
            results['head_zsplit'] = time_variant('head_zsplit', gen_z,
                                                  v_z, img, mask)
        finally:
            s2d_mod.conv2d_reflect_phase = real_phase

    if {'full', 'spectral_skip', 'no_blocks'} <= set(results):
        f, s, r = (results['full'], results['spectral_skip'],
                   results['no_blocks'])
        print(f'\nattribution (ms/batch, modulo overlap): '
              f'spectral={f - s:.1f} nonspectral_bottleneck={s - r:.1f} '
              f'rest={r:.1f} total={f:.1f}', flush=True)
    if {'headline', 'headline_skip', 'headline_noblocks'} <= set(results):
        f, s, r = (results['headline'], results['headline_skip'],
                   results['headline_noblocks'])
        print(f'\nheadline attribution (ms/batch, modulo overlap): '
              f'spectral={f - s:.1f} nonspectral_bottleneck={s - r:.1f} '
              f'rest={r:.1f} total={f:.1f}', flush=True)
    print({k: round(v, 1) for k, v in results.items()}, flush=True)


if __name__ == '__main__':
    main()
