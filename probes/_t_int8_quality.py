"""Probe: int8 serving quality drift vs fp32/bf16 with TRAINED weights.

Uses the round-3 on-chip campaign deployment export (big-lama architecture,
2000 steps on synthetic places — real trained weights, not random init) and
compares the precision=int8 serving path against fp32 and bf16 on the same
256² inpainting task. Runs on CPU (exact same quant code path as TPU).

Run: python probes/_t_int8_quality.py [model_dir=/tmp/deploy_model]
"""
import os
import sys

import numpy as np

os.environ.setdefault('LAMA_COMPILATION_CACHE', 'off')
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lama_tpu.ops import quant  # noqa: E402
from lama_tpu.serving import load_serving_model, make_inpaint_forward  # noqa: E402


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/deploy_model'
    rng = np.random.RandomState(0)
    # structured synthetic image (gradients + blocks), mask = center hole
    yy, xx = np.mgrid[0:256, 0:256] / 255.0
    img = np.stack([yy, xx, 0.5 + 0.5 * np.sin(8 * np.pi * yy) * np.cos(6 * np.pi * xx)],
                   axis=-1).astype(np.float32)
    img = np.clip(img + rng.rand(256, 256, 3).astype(np.float32) * 0.05, 0, 1)
    mask = np.zeros((256, 256, 1), np.float32)
    mask[96:192, 64:192] = 1.0
    img_b = jnp.asarray(img[None])
    mask_b = jnp.asarray(mask[None])

    outs = {}
    for precision in ('fp32', 'bf16', 'int8'):
        gen, variables, _ = load_serving_model(model_dir, 'best',
                                               precision=precision)
        fn = jax.jit(make_inpaint_forward(gen))
        outs[precision] = np.asarray(fn(variables, img_b, mask_b))[0]
        print(f'{precision}: done', flush=True)
        if precision == 'int8':
            # round-4 lever: also quantize the frequency-domain 1x1 conv
            from lama_tpu.models import ffc as ffc_mod
            ffc_mod.SPECTRAL_INT8 = True
            try:
                fn2 = jax.jit(make_inpaint_forward(gen))
                outs['int8+spectral'] = np.asarray(
                    fn2(variables, img_b, mask_b))[0]
            finally:
                ffc_mod.SPECTRAL_INT8 = False
            print('int8+spectral: done', flush=True)
    quant.INT8_SERVING = False

    hole = mask[..., 0] > 0
    ref = outs['fp32']
    for name in ('bf16', 'int8', 'int8+spectral'):
        d = outs[name][hole] - ref[hole]
        psnr = 10 * np.log10(1.0 / max(np.mean(d ** 2), 1e-12))
        print(f'{name} vs fp32 (hole): max|d|={np.abs(d).max():.4f} '
              f'mean|d|={np.abs(d).mean():.5f} PSNR={psnr:.1f} dB', flush=True)
    d = outs['int8'][hole] - outs['bf16'][hole]
    psnr = 10 * np.log10(1.0 / max(np.mean(d ** 2), 1e-12))
    print(f'int8 vs bf16 (hole): max|d|={np.abs(d).max():.4f} '
          f'mean|d|={np.abs(d).mean():.5f} PSNR={psnr:.1f} dB', flush=True)
    known = ~hole
    print('known-region exact (int8):',
          bool(np.array_equal(outs['int8'][known], ref[known])), flush=True)


if __name__ == '__main__':
    main()
