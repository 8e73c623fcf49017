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


def test_trainer_fit_pix2pixhd_generator(synth_data):
    """The fused GAN step is generator-family-agnostic: a full fit with the
    ablation preset's pix2pixhd GlobalGenerator (conv/BN/ReLU stack, no FFC
    streams — reference configs/training/ablv2_work.yaml) trains, validates
    and checkpoints like the FFC path."""
    from lama_tpu.training.trainer import InpaintingTrainer
    os.environ['LAMA_DATA_ROOT'] = str(synth_data)
    os.environ.setdefault('TORCH_HOME', '/tmp/th')
    config = compose(os.path.join(REPO, 'configs', 'training'), 'ablv2_work',
                     OVERRIDES)
    assert config.generator.kind == 'pix2pixhd_global'
    run_dir = str(synth_data / 'run_p2p')
    trainer = InpaintingTrainer(config, run_dir)
    state = trainer.fit()
    assert int(np.asarray(state.step)) == 2
    assert os.path.isdir(os.path.join(run_dir, 'models', 'last'))
    import json
    with open(os.path.join(run_dir, 'models', 'index.json')) as f:
        records = json.load(f)
    assert np.isfinite(records[0]['value'])


def test_trainer_visual_test_extra_val_and_discr_vis(synth_data):
    """The full validation fan-out (reference base.py:124-161): val +
    visual_test + extra_val datasets each produce prefixed metrics, and
    store_discr_outputs_for_vis adds discriminator maps to the sample grids."""
    from lama_tpu.data.io import save_image
    rng = np.random.RandomState(1)
    for d in ('visual_test', 'extra1'):
        os.makedirs(synth_data / d, exist_ok=True)
        for i in range(2):
            img = rng.rand(32, 32, 3).astype(np.float32)
            mask = np.zeros((32, 32, 1), np.float32)
            mask[8:20, 8:20] = 1
            save_image(str(synth_data / d / f'v{i}.png'), img)
            save_image(str(synth_data / d / f'v{i}_mask.png'), mask)

    trainer, run_dir = make_trainer(synth_data, 'run_vt')
    # inject extra_val + discr vis + directory visualizer post-compose
    trainer.config.data['visual_test'] = dict(
        trainer.config.data.val, indir=str(synth_data / 'visual_test'))
    trainer.config.data['extra_val'] = {
        'e1': dict(trainer.config.data.val, indir=str(synth_data / 'extra1'))}
    trainer.extra_val_titles = ['e1']
    from lama_tpu.evaluation import make_evaluator
    trainer.extra_evaluators = {'e1': make_evaluator(lpips=False, fid=False,
                                                     integral_kind=None)}
    trainer.store_discr_outputs_for_vis = True
    from lama_tpu.training.visualizers import DirectoryVisualizer
    trainer.visualizer = DirectoryVisualizer(
        outdir=os.path.join(run_dir, 'samples'),
        key_order=['image', 'predicted_image', 'discr_output_fake',
                   'discr_output_real', 'inpainted'],
        rescale_keys=['discr_output_fake', 'discr_output_real'])

    trainer.fit()
    keys = trainer.validate(epoch=0)
    assert any(k.startswith('val_ssim') for k in keys)
    assert any(k.startswith('test_ssim') for k in keys)
    assert any(k.startswith('extra_val_e1_ssim') for k in keys)
    # discr maps reached the grids: sample width = 5 panels
    sample_dirs = [d for d in os.listdir(os.path.join(run_dir, 'samples'))
                   if d.startswith('epoch')]
    assert sample_dirs
    import cv2 as _cv2
    any_dir = os.path.join(run_dir, 'samples', sorted(sample_dirs)[-1])
    img = _cv2.imread(os.path.join(any_dir, sorted(os.listdir(any_dir))[0]))
    assert img.shape[1] == 5 * 32


def test_trainer_resume(synth_data):
    trainer, run_dir = make_trainer(synth_data, 'run_a')
    trainer.fit()
    last = trainer.checkpoints.last_path()

    trainer2, _ = make_trainer(synth_data, 'run_b')
    # Lightning resume semantics: epoch numbering continues and max_epochs is
    # the TOTAL cap, so extend it to actually run another epoch
    trainer2.max_epochs = 2
    state = trainer2.fit(resume_from=last)
    # resumed at step 2 (epoch 1), ran 2 more batches
    assert int(np.asarray(state.step)) == 4
    assert os.path.isdir(os.path.join(trainer2.run_dir, 'models', 'epoch1'))

    # resuming a FINISHED run (same max_epochs) trains no further
    trainer3, _ = make_trainer(synth_data, 'run_c')
    state3 = trainer3.fit(resume_from=last)
    assert int(np.asarray(state3.step)) == 2

    # resuming an EXPLICIT epochN checkpoint starts at N+1 even if later
    # epochs exist in the directory state (code-review r3 finding)
    trainer4, _ = make_trainer(synth_data, 'run_d')
    trainer4.max_epochs = 2
    state4 = trainer4.fit(resume_from=os.path.join(run_dir, 'models', 'epoch0'))
    assert int(np.asarray(state4.step)) == 4
    assert os.path.isdir(os.path.join(trainer4.run_dir, 'models', 'epoch1'))


def test_checkpoint_manager_nonfinite_monitor(tmp_path):
    """NaN/inf monitor values must rank strictly worst, never 'best'."""
    from lama_tpu.training.checkpoint import CheckpointManager
    cm = CheckpointManager(str(tmp_path / 'models'), monitor='m', mode='max',
                           save_top_k=2, save_last=False)
    cm.save({'x': np.zeros(2)}, 0, {'m': float('nan')})
    cm.save({'x': np.ones(2)}, 1, {'m': 0.5})
    cm.save({'x': np.ones(2)}, 2, {'m': 0.7})
    best = cm.best_path()
    assert best is not None and best.endswith('epoch2')
    names = {r['name'] for r in cm.records}
    assert 'epoch0' not in names  # pruned as worst


def test_checkpoint_manager_out_of_range_monitor(tmp_path):
    """Values outside the monitor's valid range (e.g. the round-3 campaign's
    pre-fix SSIM=2.05) rank strictly worst — a broken metric must never win
    checkpoint selection."""
    from lama_tpu.training.checkpoint import CheckpointManager
    cm = CheckpointManager(str(tmp_path / 'models'),
                           monitor='val_ssim_total_mean', mode='max',
                           save_top_k=2, save_last=False)
    assert cm.monitor_range == (-1.0, 1.0)  # inferred from 'ssim'
    cm.save({'x': np.zeros(2)}, 0, {'val_ssim_total_mean': 2.05})
    cm.save({'x': np.ones(2)}, 1, {'val_ssim_total_mean': 0.5})
    cm.save({'x': np.ones(2)}, 2, {'val_ssim_total_mean': 0.7})
    best = cm.best_path()
    assert best is not None and best.endswith('epoch2')
    assert 'epoch0' not in {r['name'] for r in cm.records}  # pruned as worst
    # integral monitor gets the [0, 1] range, explicit override wins
    cm2 = CheckpointManager(str(tmp_path / 'm2'))
    assert cm2.monitor_range == (0.0, 1.0)
    cm3 = CheckpointManager(str(tmp_path / 'm3'), monitor='val_ssim_total_mean',
                            monitor_range=(0.0, 0.5))
    assert cm3.monitor_range == (0.0, 0.5)


def test_checkpoint_index_repair(tmp_path):
    """CheckpointManager.repair_index drops records for deleted checkpoint
    dirs and demotes out-of-range/non-finite values (keeping the original
    under 'invalid_value'), so stale bogus records can't be selected."""
    import json
    from lama_tpu.training.checkpoint import CheckpointManager
    models = tmp_path / 'models'
    models.mkdir()
    for name in ('epoch1', 'epoch2', 'epoch3'):
        (models / name).mkdir()
    records = [
        {'name': 'epoch0', 'epoch': 0, 'value': 0.9},    # dir deleted
        {'name': 'epoch1', 'epoch': 1, 'value': 2.05},   # bogus SSIM
        {'name': 'epoch2', 'epoch': 2, 'value': float('nan')},
        {'name': 'epoch3', 'epoch': 3, 'value': 0.8},
    ]
    with open(models / 'index.json', 'w') as f:
        json.dump(records, f)
    summary = CheckpointManager.repair_index(str(models),
                                             monitor='val_ssim_total_mean')
    assert summary['dropped'] == ['epoch0']
    assert summary['demoted'] == ['epoch1', 'epoch2']
    cm = CheckpointManager(str(models), monitor='val_ssim_total_mean')
    assert cm.best_path().endswith('epoch3')
    by_name = {r['name']: r for r in cm.records}
    assert by_name['epoch1']['value'] == float('-inf')
    assert by_name['epoch1']['invalid_value'] == 2.05


def test_trainer_fit_web_dataset(synth_data, rng):
    """fit() over the webdataset kind (tar shards + IterableBatchLoader):
    steps run, checkpoints land, and set_epoch reaches the shard shuffler
    (reference wires this through webdataset + Lightning, datasets.py:48-61)."""
    import io
    import tarfile

    for s in range(2):
        with tarfile.open(synth_data / f'part{s:05d}.tar', 'w') as tf:
            for i in range(4):
                img = (rng.rand(48, 48, 3) * 255).astype('uint8')
                ok, buf = cv2.imencode('.jpg', img)
                info = tarfile.TarInfo(f's{s}_{i}.jpg')
                info.size = len(buf)
                tf.addfile(info, io.BytesIO(buf.tobytes()))

    from lama_tpu.training.trainer import InpaintingTrainer
    os.environ['LAMA_DATA_ROOT'] = str(synth_data)
    os.environ.setdefault('TORCH_HOME', '/tmp/th')
    config = compose(
        os.path.join(REPO, 'configs', 'training'), 'lama-fourier',
        OVERRIDES + [
            'data.train.kind=default_web',
            'data.train.shuffle_buffer=4',
            f'data.train.indir={synth_data}/part{{00000..00001}}.tar',
        ])
    run_dir = str(synth_data / 'run_web')
    trainer = InpaintingTrainer(config, run_dir)
    state = trainer.fit()
    assert int(np.asarray(state.step)) == 2
    assert os.path.isdir(os.path.join(run_dir, 'models', 'last'))
    assert trainer.train_dataloader().dataset.seed is not None


def test_trainer_steps_per_dispatch_matches_single(synth_data):
    """steps_per_dispatch=2 (one lax.scan dispatch of 2 fused steps,
    parallel/mesh.py::shard_train_scan) must reproduce the K=1 path's
    TRAJECTORY: same batches in the same order, same per-step PRNG keys →
    the per-step logged metrics agree to float tolerance. (Raw params are
    NOT compared: XLA fuses the scanned body independently of the
    standalone step program, and Adam normalization amplifies the ~1e-7
    compile-level jitter to lr-scale on near-zero-gradient weights — while
    every loss metric still matches to ~1e-7 relative.)"""
    from lama_tpu.training.trainer import InpaintingTrainer
    os.environ['LAMA_DATA_ROOT'] = str(synth_data)
    os.environ.setdefault('TORCH_HOME', '/tmp/th')

    def run(run_name, extra):
        config = compose(os.path.join(REPO, 'configs', 'training'),
                         'lama-fourier', OVERRIDES + extra)
        trainer = InpaintingTrainer(config, str(synth_data / run_name))
        log = []
        trainer._log_scalars = lambda prefix, m: (
            log.append(dict(m)) if prefix == 'train' else None)
        return trainer.fit(), log

    s1, log1 = run('run_k1', [])
    s2, log2 = run('run_k2', ['trainer.kwargs.steps_per_dispatch=2'])
    assert int(np.asarray(s1.step)) == int(np.asarray(s2.step)) == 2
    # log_every_n_steps=1 -> both paths logged every one of the 2 steps
    assert len(log1) == len(log2) == 2
    for m1, m2 in zip(log1, log2):
        assert m1.keys() == m2.keys()
        for k in m1:
            np.testing.assert_allclose(m1[k], m2[k], rtol=1e-4, atol=1e-6,
                                       err_msg=k)


def test_trainer_steps_per_dispatch_guards(synth_data):
    """K>1 refuses dynamic per-step shapes (rescale ramp / constant-area
    crop change the image size each step) and a limit_train_batches that is
    not a multiple of K — both would otherwise fail at compile/runtime with
    an opaque error."""
    from lama_tpu.training.trainer import InpaintingTrainer
    os.environ['LAMA_DATA_ROOT'] = str(synth_data)
    os.environ.setdefault('TORCH_HOME', '/tmp/th')

    config = compose(
        os.path.join(REPO, 'configs', 'training'), 'lama-fourier',
        OVERRIDES + ['trainer.kwargs.steps_per_dispatch=2',
                     '+training_model.const_area_crop_kwargs.min_mask_area=0.1'])
    with pytest.raises(ValueError, match='static batch shapes'):
        InpaintingTrainer(config, str(synth_data / 'run_guard1'))

    config = compose(
        os.path.join(REPO, 'configs', 'training'), 'lama-fourier',
        OVERRIDES + ['trainer.kwargs.steps_per_dispatch=2',
                     'trainer.kwargs.limit_train_batches=3'])
    with pytest.raises(ValueError, match='multiple of'):
        InpaintingTrainer(config, str(synth_data / 'run_guard2'))


def test_trainer_uint8_input_transfer_matches_fp32(synth_data):
    """input_transfer_dtype=uint8 (quantize on host, /255 inside the jitted
    step — 4x less host->device traffic) must reproduce the fp32 wire's
    trajectory exactly here: jpg-decoded images and binary masks are
    uint8-representable, so rint(x*255)/255 is the identity and only
    compile-level jitter separates the two programs."""
    from lama_tpu.training.trainer import InpaintingTrainer
    os.environ['LAMA_DATA_ROOT'] = str(synth_data)
    os.environ.setdefault('TORCH_HOME', '/tmp/th')

    def run(run_name, extra):
        config = compose(os.path.join(REPO, 'configs', 'training'),
                         'lama-fourier', OVERRIDES + extra)
        trainer = InpaintingTrainer(config, str(synth_data / run_name))
        log = []
        trainer._log_scalars = lambda prefix, m: (
            log.append(dict(m)) if prefix == 'train' else None)
        trainer.fit()
        return log

    log1 = run('run_fp32wire', [])
    log2 = run('run_u8wire', ['trainer.kwargs.input_transfer_dtype=uint8'])
    # both knobs together: the scan dispatch must stack/dequantize the uint8
    # wire exactly like the K=1 path (same trajectory within float jitter)
    log3 = run('run_u8wire_k2', ['trainer.kwargs.input_transfer_dtype=uint8',
                                 'trainer.kwargs.steps_per_dispatch=2'])
    assert len(log1) == len(log2) == len(log3) == 2
    for m1, m2, m3 in zip(log1, log2, log3):
        for k in m1:
            np.testing.assert_allclose(m1[k], m2[k], rtol=1e-4, atol=1e-6,
                                       err_msg=k)
            np.testing.assert_allclose(m1[k], m3[k], rtol=1e-4, atol=1e-6,
                                       err_msg=f'{k} (steps_per_dispatch=2)')

    config = compose(os.path.join(REPO, 'configs', 'training'), 'lama-fourier',
                     OVERRIDES + ['trainer.kwargs.input_transfer_dtype=fp16'])
    with pytest.raises(ValueError, match='input_transfer_dtype'):
        InpaintingTrainer(config, str(synth_data / 'run_badwire'))
