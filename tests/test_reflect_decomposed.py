"""The border-decomposed reflect conv (kept for a future Pallas halo-conv;
see ops/conv.py measured-negative-result note) must stay exact vs torch."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from lama_tpu.ops.conv import _conv2d_reflect_decomposed


@pytest.mark.parametrize('k,s,p,d,shape', [
    (3, 1, 1, 1, (16, 16)), (3, 2, 1, 1, (16, 16)), (7, 1, 3, 1, (20, 24)),
    (3, 1, 2, 2, (18, 18)), (5, 1, 2, 1, (15, 17)), (3, 2, 1, 1, (17, 19)),
])
def test_reflect_decomposed_matches_torch(rng, k, s, p, d, shape):
    h, w = shape
    x = rng.randn(2, 6, h, w).astype(np.float32)
    kern = rng.randn(8, 6, k, k).astype(np.float32)
    padded = TF.pad(torch.from_numpy(x), [p] * 4, mode='reflect')
    ref = TF.conv2d(padded, torch.from_numpy(kern), stride=s, dilation=d).numpy()
    out = _conv2d_reflect_decomposed(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(kern, (2, 3, 1, 0))),
        (s, s), ((p, p), (p, p)), (d, d), 1)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('k,s,p,d,shape', [
    (3, 1, 1, 1, (16, 16)), (3, 2, 1, 1, (16, 16)), (7, 1, 3, 1, (20, 24)),
    (3, 1, 2, 2, (18, 18)), (5, 1, 2, 1, (15, 17)), (3, 2, 1, 1, (17, 19)),
])
def test_reflect_border_concat_matches_torch(rng, k, s, p, d, shape):
    """Concat-reassembled variant (measured-negative in-graph, kept exact —
    see BASELINE.md round 2)."""
    from lama_tpu.ops.conv import _conv2d_reflect_border_concat
    h, w = shape
    x = rng.randn(2, 6, h, w).astype(np.float32)
    kern = rng.randn(8, 6, k, k).astype(np.float32)
    padded = TF.pad(torch.from_numpy(x), [p] * 4, mode='reflect')
    ref = TF.conv2d(padded, torch.from_numpy(kern), stride=s, dilation=d).numpy()
    out = _conv2d_reflect_border_concat(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(kern, (2, 3, 1, 0))),
        (s, s), ((p, p), (p, p)), (d, d), 1)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-4)
