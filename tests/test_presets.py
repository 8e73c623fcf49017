"""All shipped training presets must compose, and their generator/discriminator
configs must build and run a forward pass (tiny overrides)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lama_tpu.config import compose

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN_CFG = os.path.join(REPO, 'configs', 'training')

ALL_PRESETS = sorted(f[:-5] for f in os.listdir(TRAIN_CFG) if f.endswith('.yaml'))


@pytest.mark.parametrize('name', ALL_PRESETS)
def test_preset_composes(name, monkeypatch):
    monkeypatch.setenv('TORCH_HOME', '/tmp/th')
    cfg = compose(TRAIN_CFG, name)
    assert cfg.generator.kind in ('ffc_resnet', 'pix2pixhd_global',
                                  'pix2pixhd_multidilated')
    assert cfg.discriminator.kind == 'pix2pixhd_nlayer'
    assert cfg.losses.l1.weight_known == 10


@pytest.mark.parametrize('name', ['ablv2_work', 'ablv2_work_md', 'lama-fourier'])
def test_preset_generator_builds(name, rng, monkeypatch):
    monkeypatch.setenv('TORCH_HOME', '/tmp/th')
    from lama_tpu.models import make_generator
    cfg = compose(TRAIN_CFG, name, ['generator.ngf=8', 'generator.n_blocks=2',
                                    'generator.n_downsampling=2'])
    kw = dict(cfg.generator)
    gen = make_generator(kw.pop('kind'), **kw)
    x = jnp.asarray(rng.rand(1, 64, 64, 4).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    out = gen.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 3)


def test_web_dataset_loader(tmp_path, rng):
    import tarfile
    import io
    import cv2
    from lama_tpu.data.datasets import make_default_train_dataloader

    tar_path = tmp_path / 'shard-000.tar'
    with tarfile.open(tar_path, 'w') as tf:
        for i in range(6):
            img = (rng.rand(80, 80, 3) * 255).astype('uint8')
            ok, buf = cv2.imencode('.jpg', img)
            info = tarfile.TarInfo(f'sample{i}.jpg')
            info.size = len(buf)
            tf.addfile(info, io.BytesIO(buf.tobytes()))

    loader = make_default_train_dataloader(
        str(tar_path), kind='default_web', out_size=64,
        mask_gen_kwargs=dict(irregular_proba=1,
                             irregular_kwargs=dict(max_len=20, max_width=10,
                                                   max_times=3, min_times=1),
                             box_proba=0, segm_proba=0),
        transform_variant='default',
        dataloader_kwargs=dict(batch_size=2))
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]['image'].shape == (2, 64, 64, 3)
    assert batches[0]['mask'].shape == (2, 64, 64, 1)


def test_img_segmentation_dataset(tmp_path, rng):
    import cv2
    from lama_tpu.data.datasets import ImgSegmentationDataset
    from lama_tpu.data.masks import get_mask_generator
    from lama_tpu.data.transforms import get_transforms

    indir = tmp_path / 'img'
    segdir = tmp_path / 'segm'
    indir.mkdir()
    segdir.mkdir()
    cv2.imwrite(str(indir / 'a.jpg'), (rng.rand(70, 70, 3) * 255).astype('uint8'))
    cv2.imwrite(str(segdir / 'a.png'), rng.randint(1, 151, (70, 70)).astype('uint8'))

    ds = ImgSegmentationDataset(
        str(indir),
        get_mask_generator('mixed', dict(irregular_proba=1,
                                         irregular_kwargs=dict(max_len=10, max_width=5,
                                                               max_times=2, min_times=1),
                                         box_proba=0, segm_proba=0)),
        get_transforms('no_augs', 64), out_size=64, segm_indir=str(segdir))
    item = ds[0]
    assert item['image'].shape == (64, 64, 3)
    assert item['segm'].shape == (64, 64, 150)
    assert item['segm_classes'].shape == (64, 64, 1)


def test_resnet_pl_nondilated(rng):
    from lama_tpu.losses.perceptual import ResNetPL
    pl = ResNetPL(weights_path=None, arch_encoder='resnet50', allow_random_weights=True)
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    assert float(pl(a, b)) > 0
