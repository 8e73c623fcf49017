"""Probe: STATIC int8 activation-scale saturation sensitivity on held-out
data, with TRAINED weights (VERDICT r3 item 6, second half).

Protocol: calibrate static scales on K images (serving.calibrate_int8),
then serve a DISJOINT suite of structured synthetic images and compare each
against (a) dynamic-scale int8 and (b) fp32 — hole-region max|Δ| and PSNR.
Activations exceeding the calibrated amax saturate at ±127, so this measures
what a real deployment (calibrate once, serve forever) actually risks.
Runs on CPU — identical quant code path as TPU.

Run: python probes/_t_int8_static_quality.py [model_dir=/root/deploy_r4] [K=4]
     [platform=cpu|axon] [N=24]
platform=axon runs the three serving programs on the real chip with the
eval suite BATCHED into one forward per mode (3 compiles + 3 transfers
instead of 72 relay round trips) — the single-core CPU run needs >90 min,
the chip run minutes.
"""
import os
import sys

import numpy as np

os.environ.setdefault('LAMA_COMPILATION_CACHE', 'off')
import jax  # noqa: E402
if not any(a.startswith('platform=axon') for a in sys.argv[1:]):
    jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lama_tpu.ops import quant  # noqa: E402
from lama_tpu.serving import (calibrate_int8, load_serving_model,  # noqa: E402
                              make_inpaint_forward)


def synth(rng, s=256):
    """Structured image (gradients + sinusoid + noise) — the
    _t_int8_quality.py family's input distribution."""
    yy, xx = np.mgrid[0:s, 0:s] / float(s - 1)
    fy, fx = rng.randint(2, 12), rng.randint(2, 12)
    img = np.stack([yy * rng.rand(), xx * rng.rand(),
                    0.5 + 0.5 * np.sin(fy * np.pi * yy) * np.cos(fx * np.pi * xx)],
                   axis=-1).astype(np.float32)
    img = np.clip(img + rng.rand(s, s, 3).astype(np.float32) * 0.1, 0, 1)
    mask = np.zeros((s, s, 1), np.float32)
    h0, w0 = rng.randint(s // 8, s // 2, 2)
    mask[h0:h0 + s // 3, w0:w0 + s // 3] = 1.0
    return img, mask


def main():
    model_dir, K, n_eval = '/root/deploy_r4', 4, 24
    for a in sys.argv[1:]:
        k, _, v = a.partition('=')
        if k == 'model_dir':
            model_dir = v
        elif k == 'K':
            K = int(v)
        elif k == 'N':
            n_eval = int(v)
        elif k in ('platform', 'headline'):
            pass  # platform consumed at import time; headline read in main
        else:
            raise SystemExit(f'unknown arg {a!r} '
                             '(model_dir=, K=, N=, platform=, headline=)')
    N_EVAL = n_eval
    if jax.default_backend() != 'cpu':
        from lama_tpu.utils import enable_compilation_cache
        enable_compilation_cache()

    rng = np.random.RandomState(7)
    calib_pairs = [tuple(a[None] for a in synth(rng)) for _ in range(K)]
    eval_pairs = [synth(rng) for _ in range(N_EVAL)]  # disjoint draws

    # Each mode is TRACED AND SERVED immediately after its load — the int8
    # load flips module-level flags that a lazily-traced earlier jit would
    # otherwise pick up (the fp32 "reference" would serve quantized).
    imgs = jnp.asarray(np.stack([p[0] for p in eval_pairs]))
    masks = jnp.asarray(np.stack([p[1] for p in eval_pairs]))
    batched = jax.default_backend() != 'cpu'

    def serve_suite(fn, variables):
        if batched:  # chip: ONE forward for the whole suite
            return np.asarray(fn(variables, imgs, masks))
        return np.stack([np.asarray(fn(variables, imgs[n:n + 1],
                                       masks[n:n + 1]))[0]
                         for n in range(N_EVAL)])

    gen, v_fp32, _ = load_serving_model(model_dir, 'best', precision='fp32')
    print('serving fp32 reference...', flush=True)
    refs = serve_suite(jax.jit(make_inpaint_forward(gen)), v_fp32)

    gen8, v_int8, _ = load_serving_model(model_dir, 'best', precision='int8')
    print('serving dynamic int8...', flush=True)
    dyns = serve_suite(jax.jit(make_inpaint_forward(gen8)), v_int8)
    v_static = calibrate_int8(gen8, v_int8, calib_pairs)
    assert 'quant_stats' in v_static, 'no eligible convs?'
    print('serving static int8...', flush=True)
    stas = serve_suite(jax.jit(make_inpaint_forward(gen8)), v_static)

    heads = None
    if any(a == 'headline=true' for a in sys.argv[1:]):
        # the full bench.py headline mode (static + zero-pad + bf16 spectral
        # store) — on the chip this validates the bf16-store lever under the
        # REAL TPU numerics (bf16 matmul operands), which the CPU gate in
        # _t_int8_quality.py can only approximate (f32 operands, bf16 stores)
        gen_h, v_h, _ = load_serving_model(model_dir, 'best',
                                           precision='int8',
                                           quant_zero_pad=True,
                                           spectral_bf16_store=True)
        v_h = calibrate_int8(gen_h, v_h, calib_pairs)
        print('serving headline (static+zeropad+bf16store)...', flush=True)
        heads = serve_suite(jax.jit(make_inpaint_forward(gen_h)), v_h)

    rows = []
    for n, (img, mask) in enumerate(eval_pairs):
        ref, dyn, sta = refs[n], dyns[n], stas[n]
        hole = mask[..., 0] > 0

        def metrics(out):
            d = np.abs(out[hole] - ref[hole])
            mse = float((d ** 2).mean())
            return float(d.max()), (10 * np.log10(1.0 / mse) if mse > 0
                                    else float('inf'))

        h_metrics = metrics(heads[n]) if heads is not None else (0.0, 0.0)
        rows.append((metrics(dyn), metrics(sta),
                     float(np.abs(sta[hole] - dyn[hole]).max()), h_metrics))
        extra = (f'  headline max|d|={h_metrics[0]:.2e} '
                 f'PSNR={h_metrics[1]:.1f}' if heads is not None else '')
        print(f'  dyn max|d|={rows[-1][0][0]:.2e} PSNR={rows[-1][0][1]:.1f}  '
              f'sta max|d|={rows[-1][1][0]:.2e} PSNR={rows[-1][1][1]:.1f}  '
              f'sta-dyn={rows[-1][2]:.2e}{extra}', flush=True)
    quant.INT8_SERVING = False

    dyn_max = max(r[0][0] for r in rows)
    dyn_psnr = min(r[0][1] for r in rows)
    sta_max = max(r[1][0] for r in rows)
    sta_psnr = min(r[1][1] for r in rows)
    cross = max(r[2] for r in rows)
    print(f'K={K} calibration images, {N_EVAL} held-out eval images '
          f'(hole region vs fp32, worst case over suite):')
    print(f'  dynamic int8 : max|d|={dyn_max:.2e}  worst PSNR={dyn_psnr:.1f} dB')
    print(f'  static  int8 : max|d|={sta_max:.2e}  worst PSNR={sta_psnr:.1f} dB')
    print(f'  static vs dynamic max|d| = {cross:.2e}')
    if heads is not None:
        h_max = max(r[3][0] for r in rows)
        h_psnr = min(r[3][1] for r in rows)
        print(f'  headline (static+zeropad+bf16store): max|d|={h_max:.2e}  '
              f'worst PSNR={h_psnr:.1f} dB')


if __name__ == '__main__':
    main()
