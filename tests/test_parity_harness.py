"""bin/verify_reference_parity.py — the one-command reference-parity campaign
(VERDICT r3 item 4), proven end to end with SYNTHETIC reference-format
weights (the real big-lama/VGG16/Inception/ADE20k blobs are egress-blocked
in this sandbox; flax_to_torch produces byte-layout-identical state_dicts,
so the converter/serving/metric plumbing is fully exercised)."""
import argparse
import json
import os
import sys

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from lama_tpu.data.io import save_image
from lama_tpu.training.convert import flax_to_torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'bin'))


def _torch_sd(variables, model=None, prefix=''):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
            flax_to_torch(variables, model=model, prefix=prefix).items()}


@pytest.mark.slow
def test_parity_harness_end_to_end(tmp_path, rng):
    from test_predict_cli import TINY_GEN_CFG
    from lama_tpu.models import make_generator

    weights = tmp_path / 'weights'
    weights.mkdir()

    # --- generator: reference deployment .ckpt (state under 'state_dict')
    kw = dict(TINY_GEN_CFG)
    gen = make_generator(kw.pop('kind'), **kw)
    gv = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)), train=False)
    torch.save({'state_dict': _torch_sd(gv, model=gen, prefix='generator.')},
               weights / 'big-lama.ckpt')
    with open(weights / 'generator_config.yaml', 'w') as f:
        yaml.safe_dump({'generator': dict(TINY_GEN_CFG)}, f)

    # --- LPIPS vgg16 trunk (torchvision features.N.* keys)
    from lama_tpu.models.aux.vgg import (VGG16_CFG, VGG16_LPIPS_TAPS,
                                         VGGFeatures)
    vgg = VGGFeatures(cfg=tuple(VGG16_CFG), tap_indices=VGG16_LPIPS_TAPS,
                      pool='max')
    vv = vgg.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    torch.save(_torch_sd(vv), weights / 'lpips_vgg16.pth')

    # --- FID inception (pytorch-fid key layout)
    from lama_tpu.models.aux.inception import FIDInceptionV3
    inc = FIDInceptionV3(output_blocks=(3,))
    iv = inc.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)),
                  train=False)
    torch.save(_torch_sd(iv), weights / 'fid_inception.pth')

    # --- ADE20k encoder/decoder pair (TORCH_HOME layout)
    from lama_tpu.models.aux.segmentation import SegmentationModuleNet
    seg = SegmentationModuleNet()
    sv = seg.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)),
                  train=False)
    d = weights / 'ade20k' / 'ade20k-resnet50dilated-ppm_deepsup'
    d.mkdir(parents=True)
    for part, fname in (('encoder', 'encoder_epoch_20.pth'),
                        ('decoder', 'decoder_epoch_20.pth')):
        pt = {'params': sv['params'][part],
              'batch_stats': sv['batch_stats'][part]}
        torch.save(_torch_sd(pt), d / fname)

    # --- fixed suite: 3 image+mask pairs
    datadir = tmp_path / 'suite'
    datadir.mkdir()
    for i in range(3):
        img = rng.rand(64, 64, 3).astype(np.float32)
        mask = np.zeros((64, 64, 1), np.float32)
        mask[8:24 + 8 * i, 8:32] = 1.0
        save_image(str(datadir / f's{i}.png'), img)
        save_image(str(datadir / f's{i}_mask.png'), mask)

    # --- a loose expected band proves the pass/fail plumbing
    with open(tmp_path / 'expected.json', 'w') as f:
        json.dump({'ssim_total_mean': [0.5, 0.5]}, f)

    import verify_reference_parity as vrp
    from lama_tpu.evaluation.fid import InceptionActivations
    prior_singleton = InceptionActivations._singleton
    prior_env = {k: os.environ.get(k) for k in
                 ('LAMA_LPIPS_VGG_WEIGHTS', 'LAMA_FID_INCEPTION_WEIGHTS')}
    try:
        report = vrp.main(argparse.Namespace(
            weights_dir=str(weights), datadir=str(datadir),
            outdir=str(tmp_path / 'out'),
            expected=str(tmp_path / 'expected.json'),
            config=os.path.join(REPO, 'configs', 'eval2.yaml'),
            metrics='ssim,lpips,fid', img_suffix='.png', batch_size=2,
            device='cpu'))
    finally:
        InceptionActivations._singleton = prior_singleton
        for k, v in prior_env.items():
            os.environ.pop(k, None) if v is None else os.environ.__setitem__(k, v)

    for net in ('generator', 'lpips_vgg16', 'fid_inception', 'ade20k'):
        assert report['nets'][net]['status'] == 'PASS', report['nets'][net]
    assert report['checks'] and report['checks'][0]['pass']
    assert report['pass'] is True
    assert 'lpips_fid100_f1_total_mean' in report['metrics']
    assert os.path.exists(tmp_path / 'out' / 'metrics.tsv')
    assert len(list((tmp_path / 'out' / 'predictions').glob('*.png'))) == 3
    with open(tmp_path / 'out' / 'parity_report.json') as f:
        assert json.load(f)['pass'] is True


def test_parity_harness_detects_bad_and_missing_weights(tmp_path, rng):
    """A truncated checkpoint must FAIL its conversion gate (strict key
    check) and missing aux files must SKIP, with the overall report failing
    only on FAIL."""
    from test_predict_cli import TINY_GEN_CFG
    from lama_tpu.models import make_generator

    weights = tmp_path / 'weights'
    weights.mkdir()
    kw = dict(TINY_GEN_CFG)
    gen = make_generator(kw.pop('kind'), **kw)
    gv = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)), train=False)
    sd = _torch_sd(gv, model=gen, prefix='generator.')
    for k in list(sd)[:3]:  # truncate -> strict load must fail
        del sd[k]
    torch.save({'state_dict': sd}, weights / 'big-lama.ckpt')
    with open(weights / 'generator_config.yaml', 'w') as f:
        yaml.safe_dump({'generator': dict(TINY_GEN_CFG)}, f)

    datadir = tmp_path / 'suite'
    datadir.mkdir()
    save_image(str(datadir / 's0.png'), rng.rand(64, 64, 3).astype(np.float32))
    save_image(str(datadir / 's0_mask.png'), np.ones((64, 64, 1), np.float32))

    import verify_reference_parity as vrp
    report = vrp.main(argparse.Namespace(
        weights_dir=str(weights), datadir=str(datadir),
        outdir=str(tmp_path / 'out'), expected=None,
        config=os.path.join(REPO, 'configs', 'eval2.yaml'),
        metrics='ssim', img_suffix='.png', batch_size=1, device='cpu'))
    assert report['nets']['generator']['status'] == 'FAIL'
    assert report['nets']['lpips_vgg16']['status'] == 'SKIP'
    assert report['nets']['fid_inception']['status'] == 'SKIP'
    assert report['nets']['ade20k']['status'] == 'SKIP'
    assert report['pass'] is False
