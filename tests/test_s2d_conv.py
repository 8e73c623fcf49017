"""Space-to-depth conv transform: exact parity vs torch reflect conv across
kernel/stride/factor combinations (ops/s2d_conv.py; measured-negative
in-graph on v5e but exact and kept for standalone serving shapes)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from lama_tpu.ops.s2d_conv import conv2d_reflect_s2d, s2d_factor_for


@pytest.mark.parametrize('k,s,a,h,w,c,co', [
    (7, 1, 2, 32, 40, 4, 6),
    (7, 1, 4, 32, 32, 4, 64),
    (7, 1, 8, 64, 64, 4, 64),
    (7, 1, 8, 64, 64, 64, 3),
    (3, 2, 2, 32, 32, 8, 16),
    (3, 2, 4, 64, 64, 8, 16),
    (3, 1, 2, 32, 32, 8, 16),
])
def test_s2d_conv_matches_torch_reflect(rng, k, s, a, h, w, c, co):
    p = k // 2
    x = rng.randn(2, h, w, c).astype(np.float32)
    kern = rng.randn(k, k, c, co).astype(np.float32) * 0.1
    bias = rng.randn(co).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    kt = torch.from_numpy(np.transpose(kern, (3, 2, 0, 1)))
    ref = TF.conv2d(TF.pad(xt, [p] * 4, mode='reflect'), kt,
                    bias=torch.from_numpy(bias), stride=s).numpy()
    out = conv2d_reflect_s2d(jnp.asarray(x), jnp.asarray(kern),
                             bias=jnp.asarray(bias), stride=s, a=a)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-4)


def test_s2d_factor_table():
    assert s2d_factor_for(512, 512, 4, 64, 7, 1) == 2     # stem-like
    assert s2d_factor_for(512, 512, 64, 3, 7, 1) == 8     # head-like
    assert s2d_factor_for(512, 512, 64, 128, 3, 2) == 2   # down1-like
    assert s2d_factor_for(64, 64, 128, 128, 3, 1) is None  # bottleneck: plain
    assert s2d_factor_for(512, 512, 256, 512, 3, 2) is None
