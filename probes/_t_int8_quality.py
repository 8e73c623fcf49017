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
    # two masks: a CENTER hole and a BORDER-touching hole — padding-semantics
    # levers (quant.ZERO_PAD_SERVING) only show up where feature-map borders
    # matter
    mask_border = np.zeros((256, 256, 1), np.float32)
    mask_border[0:96, 0:128] = 1.0
    cases = {'center': mask, 'border': mask_border}

    img_b = jnp.asarray(img[None])
    outs = {k: {} for k in cases}
    for precision in ('fp32', 'bf16', 'int8'):
        gen, variables, _ = load_serving_model(model_dir, 'best',
                                               precision=precision)
        fn = jax.jit(make_inpaint_forward(gen))
        for case, m in cases.items():
            outs[case][precision] = np.asarray(
                fn(variables, img_b, jnp.asarray(m[None])))[0]
        print(f'{precision}: done', flush=True)
        if precision == 'int8':
            from lama_tpu.models import ffc as ffc_mod
            from lama_tpu.ops import spectral as spectral_mod
            variants = (('int8+spectral', [(ffc_mod, 'SPECTRAL_INT8')]),
                        ('int8+zeropad', [(quant, 'ZERO_PAD_SERVING')]),
                        ('int8+bf16store', [(spectral_mod, 'BF16_STORE')]),
                        ('int8+zp+bf16store', [(quant, 'ZERO_PAD_SERVING'),
                                               (spectral_mod, 'BF16_STORE')]))
            for name, flags in variants:
                for mod, attr in flags:
                    setattr(mod, attr, True)
                try:
                    fn2 = jax.jit(make_inpaint_forward(gen))
                    for case, m in cases.items():
                        outs[case][name] = np.asarray(
                            fn2(variables, img_b, jnp.asarray(m[None])))[0]
                finally:
                    for mod, attr in flags:
                        setattr(mod, attr, False)
                print(f'{name}: done', flush=True)
    quant.INT8_SERVING = False

    for case, m in cases.items():
        hole = m[..., 0] > 0
        ref = outs[case]['fp32']
        print(f'--- {case} hole ---', flush=True)
        for name in ('bf16', 'int8', 'int8+spectral', 'int8+zeropad',
                     'int8+bf16store', 'int8+zp+bf16store'):
            d = outs[case][name][hole] - ref[hole]
            psnr = 10 * np.log10(1.0 / max(np.mean(d ** 2), 1e-12))
            print(f'{name} vs fp32: max|d|={np.abs(d).max():.4f} '
                  f'mean|d|={np.abs(d).mean():.5f} PSNR={psnr:.1f} dB',
                  flush=True)
        known = ~hole
        print('known-region exact (int8):',
              bool(np.array_equal(outs[case]['int8'][known], ref[known])),
              flush=True)


if __name__ == '__main__':
    main()
