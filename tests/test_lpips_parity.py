"""LPIPS parity vs the ACTUAL reference implementation
(/root/reference/saicinpainting/evaluation/losses/lpips.py): the lin-head +
normalize + aggregate math with the real vendored calibration weights on both
sides, driven by identical random 'backbone features' (the vgg16 backbone
itself is blocked by zero egress and is covered by the converter tests)."""
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lama_tpu.evaluation.lpips import (LPIPS, _SCALE, _SHIFT,
                                       default_lin_weights_path,
                                       normalize_tensor)

REFERENCE = '/root/reference'
REF_VGG_PTH = os.path.join(REFERENCE, 'models', 'lpips_models', 'vgg.pth')
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference checkout not available')


@pytest.fixture(scope='module')
def ref_lpips_mod():
    from conftest import stub_reference_deps
    stub_reference_deps()
    from saicinpainting.evaluation.losses import lpips as ref_lpips
    return ref_lpips


def test_default_lin_heads_load_and_match_reference_pth():
    """Default construction loads the vendored heads, and they equal the
    reference .pth values exactly."""
    m = LPIPS(net='vgg')  # no paths: vendored npz default
    ref_state = torch.load(REF_VGG_PTH, map_location='cpu', weights_only=False)
    for i, w in enumerate(m.lin_weights):
        ref_w = ref_state[f'lin{i}.model.1.weight'].numpy()  # (1,C,1,1)
        np.testing.assert_array_equal(np.asarray(w)[0, 0, :, 0], ref_w[0, :, 0, 0])
    assert os.path.exists(default_lin_weights_path('vgg'))
    assert os.path.exists(default_lin_weights_path('alex'))
    assert os.path.exists(default_lin_weights_path('squeeze'))


def test_scaling_constants_match_reference(ref_lpips_mod):
    sl = ref_lpips_mod.ScalingLayer()
    np.testing.assert_allclose(sl.shift.numpy().ravel(), _SHIFT, atol=0)
    np.testing.assert_allclose(sl.scale.numpy().ravel(), _SCALE, atol=0)


def test_lin_normalize_aggregate_parity(ref_lpips_mod, rng):
    """Feed both implementations identical per-tap features; the reference
    side runs its normalize_tensor -> NetLinLayer(real weights) ->
    spatial_average -> sum (lpips.py:579-597); ours runs the jax equivalent.
    Results must agree to float32 precision."""
    chns = [64, 128, 256, 512, 512]
    ref_state = torch.load(REF_VGG_PTH, map_location='cpu', weights_only=False)

    lins = []
    for i, c in enumerate(chns):
        lin = ref_lpips_mod.NetLinLayer(c, use_dropout=True)
        lin.model[1].weight.data = ref_state[f'lin{i}.model.1.weight']
        lin.eval()
        lins.append(lin)

    feats0 = [rng.rand(2, c, 8, 8).astype(np.float32) for c in chns]
    feats1 = [rng.rand(2, c, 8, 8).astype(np.float32) for c in chns]

    # ---- reference math (torch, NCHW)
    with torch.no_grad():
        val = None
        for kk in range(len(chns)):
            f0 = ref_lpips_mod.normalize_tensor(torch.from_numpy(feats0[kk]))
            f1 = ref_lpips_mod.normalize_tensor(torch.from_numpy(feats1[kk]))
            d = (f0 - f1) ** 2
            r = ref_lpips_mod.spatial_average(lins[kk].model(d), keepdim=True)
            val = r if val is None else val + r
        ref_val = val.numpy().ravel()

    # ---- ours (jax, NHWC) — same aggregation LPIPS.__call__ performs
    m = LPIPS(net='vgg')
    total = 0.0
    for kk in range(len(chns)):
        f0 = normalize_tensor(jnp.asarray(np.transpose(feats0[kk], (0, 2, 3, 1))))
        f1 = normalize_tensor(jnp.asarray(np.transpose(feats1[kk], (0, 2, 3, 1))))
        d = jnp.square(f0 - f1)
        import jax
        v = jax.lax.conv_general_dilated(d, jnp.abs(m.lin_weights[kk]), (1, 1),
                                         'VALID',
                                         dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        total = total + jnp.mean(v, axis=(1, 2, 3))
    ours = np.asarray(total)

    np.testing.assert_allclose(ours, ref_val, rtol=1e-5, atol=1e-7)


def test_lpips_end_to_end_finite_and_ordered(rng):
    """Full metric sanity with the default heads: identical images score 0,
    perturbed images score higher."""
    m = LPIPS(net='vgg')
    a = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    b = jnp.clip(a + 0.25 * jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)), 0, 1)
    same = float(m(a, a)[0])
    diff = float(m(a, b)[0])
    assert abs(same) < 1e-6
    assert diff > same
