"""Trainer orchestration smoke: config-driven fit (train + validate +
checkpoint + visualize) on synthetic data, then resume."""
import os

import cv2
import numpy as np
import pytest
import yaml

import jax

from lama_tpu.config import compose

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OVERRIDES = [
    'generator.ngf=8', 'generator.n_blocks=1', 'generator.n_downsampling=2',
    'discriminator.ndf=8', 'discriminator.n_layers=2',
    'data.batch_size=2', 'data.val_batch_size=2', 'data.train.out_size=32',
    'data.train.transform_variant=no_augs',
    # shrink masks to fit 32px test images (train defaults assume 256px)
    'data.train.mask_gen_kwargs.irregular_kwargs.max_len=10',
    'data.train.mask_gen_kwargs.irregular_kwargs.max_width=4',
    'data.train.mask_gen_kwargs.box_kwargs.margin=2',
    'data.train.mask_gen_kwargs.box_kwargs.bbox_min_size=5',
    'data.train.mask_gen_kwargs.box_kwargs.bbox_max_size=12',
    'losses.resnet_pl.weight=0',
    'evaluator.lpips=false', 'evaluator.fid=false', 'evaluator.integral_kind=null',
    'trainer.kwargs.max_epochs=1', 'trainer.kwargs.limit_train_batches=2',
    'trainer.kwargs.log_every_n_steps=1', 'trainer.kwargs.precision=fp32',
    'trainer.checkpoint_kwargs.monitor=val_ssim_total_mean',
]


@pytest.fixture
def synth_data(tmp_path, rng):
    os.makedirs(tmp_path / 'train')
    os.makedirs(tmp_path / 'val')
    for i in range(4):
        cv2.imwrite(str(tmp_path / 'train' / f't{i}.jpg'),
                    (rng.rand(48, 48, 3) * 255).astype('uint8'))
    from lama_tpu.data.io import save_image
    for i in range(2):
        img = rng.rand(32, 32, 3).astype(np.float32)
        mask = np.zeros((32, 32, 1), np.float32)
        mask[8:20, 8:20] = 1
        save_image(str(tmp_path / 'val' / f'v{i}.png'), img)
        save_image(str(tmp_path / 'val' / f'v{i}_mask.png'), mask)
    return tmp_path


def make_trainer(tmp_path, run_name='run'):
    from lama_tpu.training.trainer import InpaintingTrainer
    os.environ['LAMA_DATA_ROOT'] = str(tmp_path)
    os.environ.setdefault('TORCH_HOME', '/tmp/th')
    config = compose(os.path.join(REPO, 'configs', 'training'), 'lama-fourier',
                     OVERRIDES)
    run_dir = str(tmp_path / run_name)
    return InpaintingTrainer(config, run_dir), run_dir


def test_trainer_fit_and_artifacts(synth_data):
    trainer, run_dir = make_trainer(synth_data)
    state = trainer.fit()
    assert int(np.asarray(state.step)) == 2
    assert os.path.isdir(os.path.join(run_dir, 'models', 'epoch0'))
    assert os.path.isdir(os.path.join(run_dir, 'models', 'last'))
    best = trainer.checkpoints.best_path()
    assert best is not None
    # val monitor recorded
    import json
    with open(os.path.join(run_dir, 'models', 'index.json')) as f:
        records = json.load(f)
    assert np.isfinite(records[0]['value'])


def test_trainer_resume(synth_data):
    trainer, run_dir = make_trainer(synth_data, 'run_a')
    trainer.fit()
    last = trainer.checkpoints.last_path()

    trainer2, _ = make_trainer(synth_data, 'run_b')
    state = trainer2.fit(resume_from=last)
    # resumed at step 2, ran 2 more batches
    assert int(np.asarray(state.step)) == 4
