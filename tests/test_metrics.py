"""Metric tests: SSIM vs a torch spec of the reference formula, LPIPS
structure + vendored-lin-head loading, FID sanity, aux net shapes,
and the offline evaluator end-to-end with mask-area bins."""
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from lama_tpu.evaluation.ssim import ssim


def torch_ssim_spec(img1, img2, window_size=11, sigma=1.5):
    """The reference SSIM formula (evaluation/losses/ssim.py:36-71) expressed
    with torch primitives (NCHW), per-image."""
    xs = torch.arange(window_size, dtype=torch.float64)
    g = torch.exp(-((xs - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).float()
    w2d = torch.outer(g, g)[None, None]
    c = img1.shape[1]
    window = w2d.expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2

    def filt(x):
        return TF.conv2d(x, window, padding=pad, groups=c)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean(dim=(1, 2, 3))


def test_ssim_matches_reference_formula(rng):
    a = rng.rand(2, 3, 40, 40).astype(np.float32)
    b = np.clip(a + rng.randn(2, 3, 40, 40).astype(np.float32) * 0.05, 0, 1)
    ref = torch_ssim_spec(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    out = ssim(jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
               jnp.asarray(np.transpose(b, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    # identical images -> ssim == 1
    one = ssim(jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
               jnp.asarray(np.transpose(a, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(one), 1.0, atol=1e-5)


def test_lpips_structure_and_vendored_lin_heads(rng):
    from lama_tpu.evaluation.lpips import LPIPS
    lin_path = '/root/reference/models/lpips_models/vgg.pth'
    lp = LPIPS(lin_weights_path=lin_path if os.path.exists(lin_path) else None)
    a = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    d_ab = np.asarray(lp(a, b))
    d_aa = np.asarray(lp(a, a))
    assert d_ab.shape == (2,)
    assert (d_ab > 0).all()
    np.testing.assert_allclose(d_aa, 0.0, atol=1e-5)  # self-distance == 0
    if os.path.exists(lin_path):
        assert len(lp.lin_weights) == 5
        assert lp.lin_weights[0].shape == (1, 1, 64, 1)


def test_inception_shapes(rng):
    from lama_tpu.models.aux.inception import FIDInceptionV3
    model = FIDInceptionV3(output_blocks=(0, 1, 2, 3), resize_input=False)
    x = jnp.asarray(rng.rand(1, 299, 299, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert outs[0].shape[-1] == 64
    assert outs[1].shape[-1] == 192
    assert outs[2].shape[-1] == 768
    assert outs[3].shape == (1, 1, 1, 2048)


def test_resnet_dilated_shapes(rng):
    from lama_tpu.models.aux.resnet import ResNetDilatedEncoder
    model = ResNetDilatedEncoder()
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    # output stride 4, 8, 8, 8 (dilated)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    assert outs[0].shape[1] == 16
    assert outs[1].shape[1] == 8
    assert outs[2].shape[1] == 8 and outs[3].shape[1] == 8
    # torch-convertible key space
    from lama_tpu.training.convert import flax_to_torch
    sd = flax_to_torch(variables, model=model)
    assert 'layer3.0.downsample.0.weight' in sd
    assert 'conv1.weight' in sd and sd['conv1.weight'].shape == (64, 3, 3, 3)


def test_resnet_pl_loss(rng):
    from lama_tpu.losses.perceptual import ResNetPL
    pl = ResNetPL(weights_path=None, allow_random_weights=True)
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v_ab = float(pl(a, b))
    v_aa = float(pl(a, a))
    assert v_ab > 0 and abs(v_aa) < 1e-6


def test_fid_from_activations_sanity(rng):
    from lama_tpu.evaluation.fid import calculate_frechet_distance
    act = rng.randn(500, 16)
    mu, sigma = act.mean(0), np.cov(act, rowvar=False)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6
    act2 = act + 5.0
    mu2, sigma2 = act2.mean(0), np.cov(act2, rowvar=False)
    d = calculate_frechet_distance(mu, sigma, mu2, sigma2)
    np.testing.assert_allclose(d, 25 * 16, rtol=1e-2)


def test_offline_evaluator_with_bins(rng, tmp_path):
    """Constant-fill model over a synthetic dataset — the bin/evaluator_example
    smoke (reference bin/evaluator_example.py) without FID inception weights."""
    from lama_tpu.evaluation.evaluator import InpaintingEvaluator
    from lama_tpu.evaluation.scores import SSIMScore

    class SynthDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            img = r.rand(32, 32, 3).astype(np.float32)
            mask = np.zeros((32, 32, 1), np.float32)
            size = 4 + 2 * (i % 4)
            mask[4:4 + size, 4:4 + size] = 1
            return dict(image=img, mask=mask,
                        inpainted=img * (1 - mask) + 0.5 * mask)

    ev = InpaintingEvaluator(SynthDataset(), scores={'ssim': SSIMScore()},
                             bins=10, batch_size=4)
    results = ev.evaluate()
    assert ('ssim', 'total') in results
    bin_keys = [k for k in results if k[1] != 'total']
    assert len(bin_keys) >= 1
    assert 0 < results[('ssim', 'total')]['mean'] < 1


def test_online_evaluator_states_merge(rng):
    from lama_tpu.evaluation.evaluator import InpaintingEvaluatorOnline
    from lama_tpu.evaluation.scores import SSIMScore

    ev = InpaintingEvaluatorOnline(scores={'ssim': SSIMScore()})
    states = []
    for i in range(3):
        img = rng.rand(2, 32, 32, 3).astype(np.float32)
        mask = (rng.rand(2, 32, 32, 1) > 0.8).astype(np.float32)
        inp = img * (1 - mask) + 0.3 * mask
        states.append(ev.process_batch({'image': img, 'mask': mask, 'inpainted': inp}))
    results = ev.evaluation_end(states=states)
    assert ('ssim', 'total') in results
    assert np.isfinite(results[('ssim', 'total')]['mean'])
