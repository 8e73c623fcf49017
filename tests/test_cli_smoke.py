"""Smoke tests for every bin/ CLI that previously had zero coverage
(VERDICT round 1): evaluate_predicts, gen_mask_dataset, make_checkpoint,
to_stablehlo, side_by_side, blur_predicts, calc_dataset_stats,
sample_from_dataset, extract_masks, gen_debug_mask_dataset, split_tar,
gen_outpainting_dataset, report_from_tb, find_best_checkpoint, fid_score,
mask_example, evaluator_example, filter_sharded_dataset, split_tar,
predict_inner_features. Each runs in-process on tiny synthetic data."""
import argparse
import json
import os
import sys
import tarfile

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from lama_tpu.data.io import save_image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'bin'))


# --------------------------------------------------------------------- fixtures
@pytest.fixture
def eval_dirs(tmp_path, rng):
    """datadir with (image, mask) pairs and predictdir with inpainted results
    in the eval2.yaml layout (img_suffix .png, inpainted_suffix .png)."""
    datadir = tmp_path / 'data'
    predictdir = tmp_path / 'pred'
    datadir.mkdir()
    predictdir.mkdir()
    for i in range(3):
        img = rng.rand(32, 32, 3).astype(np.float32)
        mask = np.zeros((32, 32, 1), np.float32)
        mask[8:20, 8:20] = 1
        save_image(str(datadir / f'scene{i}.png'), img)
        save_image(str(datadir / f'scene{i}_mask000.png'), mask)
        pred = img * 0.5 + 0.25
        save_image(str(predictdir / f'scene{i}_mask000.png'), pred)
    return datadir, predictdir


@pytest.fixture
def model_dir(tmp_path):
    from test_predict_cli import make_model_dir
    return make_model_dir(tmp_path)


# ------------------------------------------------------------------------ tests
def test_evaluate_predicts(eval_dirs, tmp_path):
    import evaluate_predicts
    datadir, predictdir = eval_dirs
    outpath = tmp_path / 'metrics.tsv'
    evaluate_predicts.main(argparse.Namespace(
        config=os.path.join(REPO, 'configs', 'eval2.yaml'),
        datadir=str(datadir), predictdir=str(predictdir),
        outpath=str(outpath), metrics='ssim', device=None))
    assert outpath.exists()
    table = open(outpath).read()
    assert 'ssim' in table and 'total' in table


def test_gen_mask_dataset(tmp_path, rng):
    import gen_mask_dataset
    indir = tmp_path / 'src'
    outdir = tmp_path / 'gen'
    indir.mkdir()
    for i in range(2):
        save_image(str(indir / f'img{i}.jpg'),
                   rng.rand(64, 96, 3).astype(np.float32))
    gen_mask_dataset.main(argparse.Namespace(
        config=os.path.join(REPO, 'configs', 'data_gen', 'random_thin_256.yaml'),
        indir=str(indir), outdir=str(outdir), n_jobs=0, ext='jpg', seed=1))
    crops = sorted(outdir.rglob('*_crop*.png'))
    masks = [f for f in crops if '_mask' in f.name]
    assert masks, list(outdir.rglob('*'))
    assert len(crops) > len(masks)  # images + masks both written


def test_make_checkpoint_and_find_best(tmp_path):
    import find_best_checkpoint
    import make_checkpoint
    from lama_tpu.training.checkpoint import save_pytree

    run = tmp_path / 'run'
    (run / 'models').mkdir(parents=True)
    with open(run / 'config.yaml', 'w') as f:
        yaml.safe_dump({'generator': {'kind': 'ffc_resnet'}}, f)
    records = []
    for e, val in [(0, 0.5), (1, 0.8)]:
        tree = {'g_params': {'w': np.full((2, 2), float(e), np.float32)},
                'g_stats': {}, 'ema_params': {'w': np.full((2, 2), float(e) + 10,
                                                           np.float32)}}
        save_pytree(str(run / 'models' / f'epoch{e}'), tree)
        records.append({'name': f'epoch{e}', 'epoch': e, 'value': val})
    with open(run / 'models' / 'index.json', 'w') as f:
        json.dump(records, f)

    out = tmp_path / 'deploy'
    make_checkpoint.main(argparse.Namespace(indir=str(run), outdir=str(out),
                                            epochs=None, no_ema=False, device=None))
    assert (out / 'config.yaml').exists()
    import orbax.checkpoint as ocp
    restored = ocp.PyTreeCheckpointer().restore(str((out / 'models' / 'best').resolve()))
    # best epoch (1) selected, ema preferred
    np.testing.assert_array_equal(np.asarray(restored['params']['w']),
                                  np.full((2, 2), 11, np.float32))

    # epoch averaging path
    out2 = tmp_path / 'deploy_avg'
    make_checkpoint.main(argparse.Namespace(indir=str(run), outdir=str(out2),
                                            epochs=[0, 1], no_ema=True, device=None))
    restored2 = ocp.PyTreeCheckpointer().restore(str((out2 / 'models' / 'best').resolve()))
    np.testing.assert_array_equal(np.asarray(restored2['params']['w']),
                                  np.full((2, 2), 0.5, np.float32))

    # --repair-index (outdir optional): a bogus out-of-range record is
    # demoted in place so the later export picks the real best epoch
    records.append({'name': 'epoch9', 'epoch': 9, 'value': 23.8})
    (run / 'models' / 'epoch9').mkdir()
    with open(run / 'models' / 'index.json', 'w') as f:
        json.dump(records, f)
    with open(run / 'config.yaml', 'w') as f:
        yaml.safe_dump({'generator': {'kind': 'ffc_resnet'},
                        'trainer': {'checkpoint_kwargs':
                                    {'monitor': 'val_ssim_total_mean'}}}, f)
    make_checkpoint.main(argparse.Namespace(indir=str(run), outdir=None,
                                            epochs=None, no_ema=False,
                                            device=None, repair_index=True))
    with open(run / 'models' / 'index.json') as f:
        repaired = json.load(f)
    assert {r['name']: r['value'] for r in repaired}['epoch9'] == float('-inf')

    # find_best_checkpoint over the run dir
    lst = tmp_path / 'runs.lst'
    lst.write_text('run\n')
    find_best_checkpoint.find_best_checkpoint(str(lst), str(tmp_path))
    best_lines = open(str(lst) + '_best').read().strip().split('\t')
    assert best_lines[1] == '1'


def test_to_stablehlo(model_dir, tmp_path):
    import to_stablehlo
    outdir = tmp_path / 'export'
    to_stablehlo.main([f'model.path={model_dir}', f'outdir={outdir}',
                       'height=64', 'width=64', 'device=cpu'])
    files = list(outdir.glob('*.stablehlo'))
    assert files and files[0].stat().st_size > 0


def test_to_stablehlo_int8(model_dir, tmp_path):
    """precision=int8 bakes the quantized-conv routing into the exported
    artifact (trace-time decision); the CLI's own roundtrip parity assert
    runs inside main()."""
    import to_stablehlo
    outdir = tmp_path / 'export8'
    to_stablehlo.main([f'model.path={model_dir}', f'outdir={outdir}',
                       'height=64', 'width=64', 'device=cpu',
                       'precision=int8'])
    files = list(outdir.glob('*_int8.stablehlo'))
    assert files and files[0].stat().st_size > 0


def test_to_stablehlo_int8_calibrated(model_dir, tmp_path, rng):
    """calibration_indir bakes STATIC int8 activation scales into the
    exported artifact (no dynamic amax reductions in the blob); the CLI's
    roundtrip parity assert runs inside main()."""
    import to_stablehlo
    from lama_tpu.data.io import save_image
    indir = tmp_path / 'calib'
    indir.mkdir()
    save_image(str(indir / 'a.png'), rng.rand(64, 64, 3).astype(np.float32))
    mask = np.zeros((64, 64, 1), np.float32)
    mask[16:48, 16:48] = 1.0
    save_image(str(indir / 'a_mask.png'), mask)
    outdir = tmp_path / 'export8c'
    to_stablehlo.main([f'model.path={model_dir}', f'outdir={outdir}',
                       'height=64', 'width=64', 'device=cpu',
                       'precision=int8', f'calibration_indir={indir}'])
    files = list(outdir.glob('*_int8.stablehlo'))
    assert files and files[0].stat().st_size > 0


def test_predict_inner_features(model_dir, tmp_path, rng):
    import predict_inner_features
    indir = tmp_path / 'in'
    outdir = tmp_path / 'feat'
    indir.mkdir()
    img = rng.rand(64, 64, 3).astype(np.float32)
    mask = np.zeros((64, 64, 1), np.float32)
    mask[16:48, 16:48] = 1
    save_image(str(indir / 'a.png'), img)
    save_image(str(indir / 'a_mask.png'), mask)
    predict_inner_features.main([f'model.path={model_dir}', f'indir={indir}',
                                 f'outdir={outdir}', 'device=cpu'])
    assert list(outdir.rglob('*.png')) or list(outdir.rglob('*.jpg'))


def test_side_by_side_and_blur(eval_dirs, tmp_path):
    import blur_predicts
    import side_by_side
    datadir, predictdir = eval_dirs
    cfg = os.path.join(REPO, 'configs', 'eval2.yaml')

    out_img = tmp_path / 'sbs.png'
    side_by_side.main(argparse.Namespace(config=cfg, outpath=str(out_img),
                                         datadir=str(datadir),
                                         predictdirs=[str(predictdir)],
                                         max_n=2, black=False))
    assert out_img.exists()

    out_blur = tmp_path / 'blurred'
    blur_predicts.main(argparse.Namespace(config=cfg, datadir=str(datadir),
                                          predictdir=str(predictdir),
                                          outpath=str(out_blur), s=0.5, k=3))
    assert list(out_blur.glob('*.png'))


def test_dataset_stats_and_sampling(eval_dirs, tmp_path):
    import calc_dataset_stats
    import sample_from_dataset
    datadir, _ = eval_dirs
    out1 = tmp_path / 'stats'
    calc_dataset_stats.main(argparse.Namespace(datadir=str(datadir),
                                               outdir=str(out1), samples_n=2,
                                               area_bins=4))
    assert list(out1.iterdir())
    out2 = tmp_path / 'samples'
    sample_from_dataset.main(argparse.Namespace(datadir=str(datadir),
                                                outdir=str(out2), samples_n=2,
                                                area_bins=4))
    assert list(out2.rglob('*'))


def test_extract_masks_and_outpainting(tmp_path, rng):
    import extract_masks
    import gen_outpainting_dataset
    indir = tmp_path / 'white'
    indir.mkdir()
    img = (rng.rand(32, 32, 3) * 0.5).astype(np.float32)
    img[4:12, 4:12] = 1.0  # white patch = mask source
    save_image(str(indir / 'w0.png'), img)
    out = tmp_path / 'extracted'
    extract_masks.main(argparse.Namespace(indir=str(indir), outdir=str(out)))
    assert list(out.rglob('*.png'))

    out2 = tmp_path / 'outpaint'
    gen_outpainting_dataset.main(argparse.Namespace(
        indir=str(indir), outdir=str(out2), img_suffix='.png', expand=False,
        coef=0.2))
    assert list(out2.rglob('*mask*.png'))


def test_gen_debug_mask_dataset(tmp_path, rng):
    import gen_debug_mask_dataset
    indir = tmp_path / 'src'
    indir.mkdir()
    # debug_mask_gen.yaml slides a 200px square at step 100 — needs >200px
    save_image(str(indir / 'a.png'), rng.rand(256, 256, 3).astype(np.float32))
    out = tmp_path / 'dbg'
    gen_debug_mask_dataset.main(argparse.Namespace(
        config=os.path.join(REPO, 'configs', 'debug_mask_gen.yaml'),
        indir=str(indir), outdir=str(out)))
    assert list(out.rglob('*mask*.png'))


def test_split_and_filter_tar(tmp_path, rng):
    import filter_sharded_dataset
    import split_tar
    tar_path = tmp_path / 'in.tar'
    with tarfile.open(tar_path, 'w') as tf:
        import cv2
        for i, cat in enumerate(['a/airfield', 'b/bamboo_forest', 'z/zoo']):
            img_file = tmp_path / f'{i}.jpg'
            cv2.imwrite(str(img_file), (rng.rand(16, 16, 3) * 255).astype('uint8'))
            tf.add(img_file, arcname=f'{cat}/im{i}.jpg')

    split_tar.main(argparse.Namespace(infile=str(tar_path),
                                      outpattern=str(tmp_path / 'shard-%05d.tar'),
                                      shard_size=2))
    shards = sorted(tmp_path.glob('shard-*.tar'))
    assert len(shards) == 2

    cats = tmp_path / 'cats.txt'
    cats.write_text('a/airfield\nz/zoo\n')
    filter_sharded_dataset.main(argparse.Namespace(
        categories=str(cats), shard_size=5000, print_freq=1,
        infile=str(tar_path), outpattern=str(tmp_path / 'filt-%05d.tar')))
    with tarfile.open(sorted(tmp_path.glob('filt-*.tar'))[0]) as tf:
        names = tf.getnames()
    assert any('airfield' in n for n in names)
    assert not any('bamboo' in n for n in names)


def test_report_from_tb(tmp_path):
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        pytest.skip('tensorboardX unavailable')
    import report_from_tb
    tb_dir = tmp_path / 'tb' / 'run1'
    w = SummaryWriter(str(tb_dir))
    for step in range(3):
        w.add_scalar('train/gen_total', 1.0 - 0.1 * step, step)
        w.add_scalar('val_ssim_total_mean', 0.5 + 0.1 * step, step)
    w.close()
    out = tmp_path / 'report'
    report_from_tb.main(argparse.Namespace(
        inglob=str(tmp_path / 'tb' / '*' / 'events*'), outdir=str(out),
        include_version=False))
    assert list(out.rglob('*'))


def test_fid_score_cli(tmp_path, rng):
    import fid_score
    d1, d2 = tmp_path / 'a', tmp_path / 'b'
    d1.mkdir()
    d2.mkdir()
    for i in range(2):
        save_image(str(d1 / f'{i}.png'), rng.rand(32, 32, 3).astype(np.float32))
        save_image(str(d2 / f'{i}.png'), rng.rand(32, 32, 3).astype(np.float32))
    fid_score.main(argparse.Namespace(path1=str(d1), path2=str(d2),
                                      batch_size=2, weights=None, device=None))


def test_mask_example(tmp_path):
    import mask_example
    out = tmp_path / 'me'
    mask_example.main(argparse.Namespace(image=None, outdir=str(out), seed=0))
    assert len(list(out.glob('*.png'))) >= 6


def test_mask_suite_stats(tmp_path):
    """bin/mask_suite_stats.py: distribution stats of a generated mask suite
    + compare mode (the segm-backend divergence quantification tool)."""
    import mask_suite_stats
    suite = tmp_path / 'suite'
    suite.mkdir()
    # one 25%-area square (solidity 1, 1 component), one two-component mask
    m1 = np.zeros((64, 64), np.float32)
    m1[16:48, 16:48] = 1
    m2 = np.zeros((64, 64), np.float32)
    m2[4:14, 4:14] = 1
    m2[40:60, 40:60] = 1
    save_image(str(suite / 'a_mask000.png'), m1[..., None])
    save_image(str(suite / 'b_mask000.png'), m2[..., None])

    stats = mask_suite_stats.suite_stats(str(suite))
    assert stats['n_masks'] == 2
    assert abs(stats['area']['mean'] - (0.25 + (100 + 400) / 4096) / 2) < 1e-3
    assert stats['n_components']['mean'] == 1.5
    assert stats['solidity']['p90'] > 0.9
    assert stats['masks_per_image']['mean'] == 1.0

    out = tmp_path / 's.json'
    rc = mask_suite_stats.main(argparse.Namespace(
        suite_dir=str(suite), out=str(out), compare=None, tolerance=0.25,
        mask_glob='**/*_mask*.png'))
    assert rc == 0 and out.exists()
    # self-compare passes; a doctored reference diverges
    rc = mask_suite_stats.main(argparse.Namespace(
        suite_dir=str(suite), out=None, compare=str(out), tolerance=0.25,
        mask_glob='**/*_mask*.png'))
    assert rc == 0
    doctored = json.load(open(out))
    doctored['area']['mean'] *= 3
    with open(tmp_path / 'd.json', 'w') as f:
        json.dump(doctored, f)
    rc = mask_suite_stats.main(argparse.Namespace(
        suite_dir=str(suite), out=None, compare=str(tmp_path / 'd.json'),
        tolerance=0.25, mask_glob='**/*_mask*.png'))
    assert rc == 1


def test_evaluator_example(tmp_path, monkeypatch):
    import evaluator_example
    monkeypatch.chdir(tmp_path)
    evaluator_example.main()


def test_precompile_cli(tmp_path, model_dir, monkeypatch):
    """bin/precompile.py pre-warms the persistent compilation cache for the
    requested bucket shapes (round-3 serving tool)."""
    cache = tmp_path / 'cc'
    monkeypatch.setenv('LAMA_COMPILATION_CACHE', str(cache))
    import jax
    import precompile as precompile_cli
    keys = ('jax_compilation_cache_dir',
            'jax_persistent_cache_min_entry_size_bytes',
            'jax_persistent_cache_min_compile_time_secs')
    prior = {k: getattr(jax.config, k) for k in keys}
    try:
        precompile_cli.main([f'model.path={model_dir}', 'shapes=64x64,64x128',
                             'batch_size=2', 'device=cpu', 'precision=fp32'])
    finally:
        # enable_compilation_cache() sets process-wide jax config; restore it
        # so later tests don't write cache entries into the deleted tmp_path
        for k, v in prior.items():
            jax.config.update(k, v)
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    assert cache.is_dir() and len(list(cache.iterdir())) >= 2


def test_precompile_cli_metrics(tmp_path, model_dir, monkeypatch):
    """metrics=ssim warms the evaluation kernels alongside serving (round-4:
    the evaluate_predicts wall is trace/compile-dominated)."""
    cache = tmp_path / 'cc'
    monkeypatch.setenv('LAMA_COMPILATION_CACHE', str(cache))
    import jax
    import precompile as precompile_cli
    keys = ('jax_compilation_cache_dir',
            'jax_persistent_cache_min_entry_size_bytes',
            'jax_persistent_cache_min_compile_time_secs')
    prior = {k: getattr(jax.config, k) for k in keys}
    try:
        precompile_cli.main([f'model.path={model_dir}', 'shapes=64x64',
                             'batch_size=1', 'device=cpu', 'precision=fp32',
                             'metrics=ssim', 'metrics_batches=2,1'])
    finally:
        for k, v in prior.items():
            jax.config.update(k, v)
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    assert cache.is_dir() and len(list(cache.iterdir())) >= 1


def test_precompile_cli_int8_calibration(tmp_path, model_dir, monkeypatch):
    """precision=int8 quant_calibration=1 must warm without crashing (round-3
    regression: `spatial` was referenced before assignment) — the advertised
    way to warm the int8+static-scales headline serving mode."""
    cache = tmp_path / 'cc'
    monkeypatch.setenv('LAMA_COMPILATION_CACHE', str(cache))
    import jax
    import precompile as precompile_cli
    keys = ('jax_compilation_cache_dir',
            'jax_persistent_cache_min_entry_size_bytes',
            'jax_persistent_cache_min_compile_time_secs')
    prior = {k: getattr(jax.config, k) for k in keys}
    try:
        precompile_cli.main([f'model.path={model_dir}', 'shapes=64x64',
                             'batch_size=1', 'device=cpu', 'precision=int8',
                             'quant_calibration=1'])
    finally:
        for k, v in prior.items():
            jax.config.update(k, v)
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    assert cache.is_dir() and len(list(cache.iterdir())) >= 1
