"""Metric-kernel precision drift on TPU (follow-up to the round-3 SSIM
Precision.HIGHEST bug): TPU's default conv/dot precision truncates fp32
operands to bf16. SSIM is fixed (HIGHEST); this probe quantifies the residual
drift of LPIPS (net-lin VGG16) and the FID Inception pooled features between
the TPU default-precision path and the CPU fp32 golden.

Usage:
  python probes/_t_metric_precision.py cpu  out_cpu.json   # golden
  python probes/_t_metric_precision.py tpu  out_tpu.json
  python probes/_t_metric_precision.py diff out_cpu.json out_tpu.json
"""
import json
import sys

import numpy as np


def compute(platform):
    import jax
    if platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from lama_tpu.evaluation.lpips import LPIPS
    from lama_tpu.evaluation.fid import InceptionActivations
    from lama_tpu.evaluation.ssim import ssim

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(4, 128, 128, 3).astype(np.float32))
    b = jnp.clip(a + 0.05 * jnp.asarray(rng.randn(4, 128, 128, 3).astype(np.float32)), 0, 1)

    lp = LPIPS()  # vendored lin heads, (random trunk in this sandbox)
    lpips_vals = np.asarray(lp(a, b)).reshape(-1)
    inc = InceptionActivations()
    feats = np.asarray(inc(a))
    ssim_vals = np.asarray(ssim(a, b))
    return {'lpips': lpips_vals.tolist(),
            'ssim': ssim_vals.tolist(),
            'inception_mean': float(feats.mean()),
            'inception_abs_mean': float(np.abs(feats).mean()),
            'inception_head': feats.reshape(-1)[:16].tolist()}


def main():
    mode = sys.argv[1]
    if mode == 'diff':
        a = json.load(open(sys.argv[2]))
        b = json.load(open(sys.argv[3]))
        for k in ('lpips', 'ssim', 'inception_head'):
            x, y = np.asarray(a[k]), np.asarray(b[k])
            denom = np.maximum(np.abs(x), 1e-8)
            print(f'{k}: max|d|={np.abs(x-y).max():.3e} '
                  f'max rel={np.abs((x-y)/denom).max():.3e}', flush=True)
        return
    out = compute(mode)
    with open(sys.argv[2], 'w') as f:
        json.dump(out, f)
    print('ok', sys.argv[2], flush=True)


if __name__ == '__main__':
    main()
