"""Mask synthesis + transforms + dataset/loader tests (host-side, no device)."""
import os

import cv2
import numpy as np
import pytest

from lama_tpu.data.datasets import (BatchLoader, InpaintingDataset,
                                    InpaintingTrainDataset,
                                    make_constant_area_crop_params,
                                    make_default_train_dataloader)
from lama_tpu.data.io import ceil_modulo, load_image, pad_img_to_modulo, save_image
from lama_tpu.data.masks import (DumbAreaMaskGenerator, MixedMaskGenerator,
                                 OutpaintingMaskGenerator,
                                 make_random_irregular_mask,
                                 make_random_rectangle_mask,
                                 make_random_superres_mask)
from lama_tpu.data.transforms import get_transforms


def test_irregular_mask_properties(rng):
    m = make_random_irregular_mask((128, 128), max_len=60, max_width=20,
                                   min_times=1, max_times=5, rng=rng)
    assert m.shape == (128, 128, 1)
    assert m.dtype == np.float32
    assert set(np.unique(m)) <= {0.0, 1.0}
    assert m.sum() > 0


def test_rectangle_mask_margin(rng):
    m = make_random_rectangle_mask((100, 100), margin=10, bbox_min_size=20,
                                   bbox_max_size=40, min_times=1, max_times=1, rng=rng)
    assert m[:10].sum() == 0 and m[-10:].sum() == 0
    assert m[:, :10].sum() == 0 and m[:, -10:].sum() == 0
    assert m.sum() > 0


def test_superres_mask_periodic(rng):
    m = make_random_superres_mask((64, 64), rng=rng)
    assert m.sum() > 0


def test_dumb_mask_eval_centered():
    gen = DumbAreaMaskGenerator(is_training=False)
    m = gen((64, 64))
    # centred square of ~default_ratio area
    ratio = m.sum() / (64 * 64)
    assert 0.15 < ratio < 0.3
    assert m[0, 0, 0] == 0 and m[32, 32, 0] == 1


def test_outpainting_mask_touches_border(rng):
    gen = OutpaintingMaskGenerator()
    m = gen((64, 64), rng=rng)
    border = np.concatenate([m[0].ravel(), m[-1].ravel(), m[:, 0].ravel(), m[:, -1].ravel()])
    assert border.sum() > 0


def test_outpainting_fixed_randomness(rng):
    gen = OutpaintingMaskGenerator(is_fixed_randomness=True)
    raw = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    m1 = gen((64, 64), raw_image=raw)
    m2 = gen((64, 64), raw_image=raw)
    np.testing.assert_array_equal(m1, m2)


def test_mixed_generator_train_default(rng):
    gen = MixedMaskGenerator(
        irregular_proba=1,
        irregular_kwargs=dict(max_angle=4, max_len=200, max_width=100,
                              max_times=5, min_times=1),
        box_proba=1,
        box_kwargs=dict(margin=10, bbox_min_size=30, bbox_max_size=150,
                        max_times=4, min_times=1),
        segm_proba=0)
    for i in range(5):
        m = gen((256, 256), iter_i=i, rng=rng)
        assert m.shape == (256, 256, 1)
        assert 0 < m.mean() < 1


@pytest.mark.parametrize('variant', ['default', 'distortions', 'distortions_light',
                                     'non_space_transform', 'no_augs'])
def test_transforms_variants(rng, variant):
    img = (rng.rand(300, 280, 3) * 255).astype(np.uint8)
    t = get_transforms(variant, 256)
    out = t(image=img, rng=rng)['image']
    assert out.dtype == np.float32
    assert out.min() >= 0 and out.max() <= 1
    if variant not in ('non_space_transform', 'no_augs'):
        assert out.shape == (256, 256, 3)


def test_io_roundtrip_and_pad(tmp_path, rng):
    img = rng.rand(30, 41, 3).astype(np.float32)
    fname = str(tmp_path / 'x.png')
    save_image(fname, img)
    loaded = load_image(fname)
    assert loaded.shape == (30, 41, 3)
    np.testing.assert_allclose(loaded, img, atol=1 / 255 + 1e-6)

    padded = pad_img_to_modulo(loaded, 8)
    assert padded.shape == (32, 48, 3)
    np.testing.assert_array_equal(padded[:30, :41], loaded)


def test_train_dataset_and_loader(tmp_path, rng):
    for i in range(6):
        img = (rng.rand(300, 300, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f'img{i}.jpg'), img)
    loader = make_default_train_dataloader(
        str(tmp_path), out_size=128,
        mask_gen_kwargs=dict(irregular_proba=1,
                             irregular_kwargs=dict(max_len=50, max_width=20,
                                                   max_times=3, min_times=1),
                             box_proba=1,
                             box_kwargs=dict(margin=10, bbox_min_size=20,
                                             bbox_max_size=50, max_times=2, min_times=1),
                             segm_proba=0),
        transform_variant='default',
        dataloader_kwargs=dict(batch_size=2, shuffle=True, num_workers=2))
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b['image'].shape == (2, 128, 128, 3)
    assert b['mask'].shape == (2, 128, 128, 1)


def test_loader_sharding(tmp_path, rng):
    for i in range(8):
        cv2.imwrite(str(tmp_path / f'i{i}.jpg'), (rng.rand(64, 64, 3) * 255).astype(np.uint8))
    ds = list(range(8))

    class Identity:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {'x': np.array([i])}

    l0 = BatchLoader(Identity(), batch_size=2, shard_id=0, num_shards=2, shuffle=False)
    l1 = BatchLoader(Identity(), batch_size=2, shard_id=1, num_shards=2, shuffle=False)
    seen0 = np.concatenate([b['x'].ravel() for b in l0])
    seen1 = np.concatenate([b['x'].ravel() for b in l1])
    assert set(seen0) & set(seen1) == set()
    assert set(seen0) | set(seen1) == set(range(8))


def test_constant_area_crop(rng):
    for _ in range(10):
        y, x, h, w = make_constant_area_crop_params(256, 256, rng=rng)
        assert 0 <= y <= 256 - h and 0 <= x <= 256 - w
        assert h % 16 == 0 and w % 16 == 0


def test_eval_dataset_pairs(tmp_path, rng):
    img = rng.rand(50, 60, 3).astype(np.float32)
    mask = (rng.rand(50, 60, 1) > 0.5).astype(np.float32)
    save_image(str(tmp_path / 'scene1.png'), img)
    save_image(str(tmp_path / 'scene1_mask000.png'), mask)
    ds = InpaintingDataset(str(tmp_path), img_suffix='.png', pad_out_to_modulo=8)
    assert len(ds) == 1
    item = ds[0]
    assert item['image'].shape == (56, 64, 3)
    assert tuple(item['unpad_to_size']) == (50, 60)


def test_batchloader_parallel_fetch_deterministic(tmp_path, rng):
    """num_workers > 1 uses the dataset's fetch(item, seq) thread pool; the
    batches must be IDENTICAL for any worker count (per-item derived RNG) and
    across repeat iterations."""
    import cv2
    from lama_tpu.data.datasets import BatchLoader, InpaintingTrainDataset
    from lama_tpu.data.masks import MixedMaskGenerator
    from lama_tpu.data.transforms import get_transforms

    for i in range(8):
        cv2.imwrite(str(tmp_path / f't{i}.jpg'),
                    (rng.rand(40, 40, 3) * 255).astype('uint8'))
    def make(num_workers):
        ds = InpaintingTrainDataset(
            indir=str(tmp_path),
            mask_generator=MixedMaskGenerator(
                irregular_proba=1,
                irregular_kwargs=dict(max_len=10, max_width=4),
                box_proba=1,
                box_kwargs=dict(margin=2, bbox_min_size=5, bbox_max_size=12),
                segm_proba=0),
            transform=get_transforms('no_augs', 32), seed=7)
        dl = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                         num_workers=num_workers, seed=0)
        dl.set_epoch(1)
        return [b for b in dl]

    b1 = make(1)   # sequential producer, same fetch() per-item RNG
    b4 = make(4)   # pool path
    b4b = make(4)  # repeatability
    assert len(b1) == len(b4) == len(b4b) == 2
    # batches (images AND masks) are identical for any worker count
    for x, y in list(zip(b4, b4b)) + list(zip(b1, b4)):
        np.testing.assert_array_equal(x['image'], y['image'])
        np.testing.assert_array_equal(x['mask'], y['mask'])
    # distinct hosts (shard salt) must draw distinct mask streams
    ds = InpaintingTrainDataset(
        indir=str(tmp_path),
        mask_generator=MixedMaskGenerator(
            irregular_proba=1, irregular_kwargs=dict(max_len=10, max_width=4),
            box_proba=1,
            box_kwargs=dict(margin=2, bbox_min_size=5, bbox_max_size=12),
            segm_proba=0),
        transform=get_transforms('no_augs', 32), seed=7)
    m0 = ds.fetch(0, 0, 0)['mask']
    m1 = ds.fetch(0, 0, 1)['mask']
    assert not np.array_equal(m0, m1)


def test_batchloader_parallel_eval_dataset(tmp_path, rng):
    """Thread-safe pure-IO datasets parallelise via thread_safe_getitem and
    preserve order/content exactly."""
    from lama_tpu.data.datasets import BatchLoader, InpaintingDataset
    from lama_tpu.data.io import save_image

    for i in range(6):
        img = rng.rand(24, 24, 3).astype(np.float32)
        mask = (rng.rand(24, 24, 1) > 0.5).astype(np.float32)
        save_image(str(tmp_path / f'v{i}.png'), img)
        save_image(str(tmp_path / f'v{i}_mask.png'), mask)
    ds = InpaintingDataset(str(tmp_path), img_suffix='.png')
    seq = [b for b in BatchLoader(ds, batch_size=2, num_workers=1,
                                  shuffle=False, drop_last=False)]
    par = [b for b in BatchLoader(ds, batch_size=2, num_workers=4,
                                  shuffle=False, drop_last=False)]
    assert len(seq) == len(par) == 3
    for x, y in zip(seq, par):
        np.testing.assert_array_equal(x['image'], y['image'])
        np.testing.assert_array_equal(x['mask'], y['mask'])


# --------------------------------------------------------- web shard dataset

def _write_tar_shards(tmp_path, rng, n_shards=4, per_shard=4, size=40,
                      prefix='part'):
    """Tar shards with globally-unique constant-valued images so tests can
    identify which shard each sample came from."""
    import io
    import tarfile

    values = []
    for s in range(n_shards):
        with tarfile.open(tmp_path / f'{prefix}{s:05d}.tar', 'w') as tf:
            for i in range(per_shard):
                value = s * per_shard + i + 1
                img = np.full((size, size, 3), value, np.uint8)
                ok, buf = cv2.imencode('.png', img)
                info = tarfile.TarInfo(f's{s}_{i}.png')
                info.size = len(buf)
                tf.addfile(info, io.BytesIO(buf.tobytes()))
                values.append(value)
    return values


def test_expand_shards_brace_range(tmp_path):
    from lama_tpu.data.datasets import expand_shards

    for i in range(12):
        (tmp_path / f'part{i:05d}.tar').touch()
    pat = str(tmp_path / 'part{00000..00011}.tar')
    assert expand_shards(pat) == sorted(
        str(tmp_path / f'part{i:05d}.tar') for i in range(12))
    # glob form resolves to the same list
    assert expand_shards(str(tmp_path / 'part*.tar')) == expand_shards(pat)
    # literal path passes through
    assert expand_shards(str(tmp_path / 'part00003.tar')) == [
        str(tmp_path / 'part00003.tar')]
    # brace expansion composes with ranges that don't exist on disk: pure
    # string expansion, no existence check for non-glob entries
    assert len(expand_shards('/nope/part{00..03}.tar')) == 4


def _web_loader(tmp_path, pattern='part{00000..00003}.tar', **kwargs):
    return make_default_train_dataloader(
        str(tmp_path / pattern), kind='default_web',
        out_size=32,
        mask_gen_kwargs=dict(irregular_proba=1,
                             irregular_kwargs=dict(max_len=10, max_width=4,
                                                   max_times=2, min_times=1),
                             box_proba=0, segm_proba=0),
        transform_variant='no_augs',
        dataloader_kwargs=dict(batch_size=2), **kwargs)


def test_web_dataset_host_split_disjoint(tmp_path, rng):
    """split_by_node semantics: hosts read disjoint shard subsets covering
    the whole set (the reference delegates this to webdataset's node
    splitting, datasets.py:50)."""
    _write_tar_shards(tmp_path, rng)

    def host_values(rank, world):
        loader = _web_loader(
            tmp_path, seed=7,
            ddp_kwargs=dict(rank=rank, num_replicas=world))
        vals = set()
        for batch in loader:
            # no_augs keeps constant images constant (value/255 per pixel)
            for img in batch['image']:
                vals.add(int(round(float(img[0, 0, 0]) * 255)))
        return vals

    v0, v1 = host_values(0, 2), host_values(1, 2)
    assert v0.isdisjoint(v1)
    assert v0 | v1 == set(range(1, 17))

    with pytest.raises(ValueError, match='at least one shard'):
        _web_loader(tmp_path, seed=7, ddp_kwargs=dict(rank=4, num_replicas=5))


def test_web_dataset_epoch_determinism(tmp_path, rng):
    """Same (seed, epoch) -> identical batches even after other epochs ran
    in between (resume-stable); different epochs reshuffle."""
    _write_tar_shards(tmp_path, rng)

    def epoch_sig(loader, epoch):
        loader.set_epoch(epoch)
        return [(batch['image'].tobytes(), batch['mask'].tobytes())
                for batch in loader]

    a = _web_loader(tmp_path, seed=3)
    b = _web_loader(tmp_path, seed=3)
    e0 = epoch_sig(a, 0)
    assert epoch_sig(a, 1) != e0
    # fresh loader replays epoch 0 bit-exactly after b ran epoch 2 first
    epoch_sig(b, 2)
    assert epoch_sig(b, 0) == e0
    # a different seed produces a different epoch-0 stream
    c = _web_loader(tmp_path, seed=4)
    assert epoch_sig(c, 0) != e0


def test_web_loader_fixed_epoch_length(tmp_path, rng):
    """epoch_batches cycles the shard stream so every epoch yields EXACTLY
    that many batches regardless of per-host shard sizes — the multi-host
    hang guard (review finding r3): hosts with unequal shards must still
    step in lockstep. Cycling stays deterministic per epoch."""
    _write_tar_shards(tmp_path, rng, n_shards=3, per_shard=4)

    # host 0 of 2 owns 2 shards (8 samples), host 1 owns 1 shard (4 samples)
    def loader(rank):
        ld = _web_loader(tmp_path, pattern='part{00000..00002}.tar', seed=5,
                         ddp_kwargs=dict(rank=rank, num_replicas=2))
        ld.epoch_batches = 6  # > one pass for both hosts (batch_size=2)
        return ld

    # host0: 8 samples -> 4 batches/pass; host1: 4 samples -> 2 batches/pass
    batches_per_pass = {0: 4, 1: 2}
    for rank in (0, 1):
        ld = loader(rank)
        batches = list(ld)
        assert len(batches) == 6
        assert all(b['image'].shape == (2, 40, 40, 3) for b in batches)
        # deterministic replay of the same epoch
        again = list(ld)
        for x, y in zip(batches, again):
            np.testing.assert_array_equal(x['image'], y['image'])
        # later cycles draw fresh masks/shuffles, not a verbatim repeat
        per = batches_per_pass[rank]
        sig = [b['mask'].tobytes() for b in batches]
        assert sig[0:2] != sig[per:per + 2]


def test_web_loader_batch_larger_than_one_pass(tmp_path, rng):
    """A batch bigger than one full pass over the host's shards must still
    fill by carrying the partial batch across cycles (regression: the round-4
    multichip gate spun forever at 100% CPU because the per-cycle batch reset
    could never reach batch_size=16 from an 8-image shard set)."""
    _write_tar_shards(tmp_path, rng, n_shards=2, per_shard=4)  # 8 samples

    ld = _web_loader(tmp_path, pattern='part{00000..00001}.tar', seed=5)
    ld.batch_size = 16  # two full passes per batch
    ld.epoch_batches = 2
    batches = list(ld)
    assert len(batches) == 2
    assert all(b['image'].shape[0] == 16 for b in batches)
    # deterministic replay of the same epoch
    again = list(ld)
    for x, y in zip(batches, again):
        np.testing.assert_array_equal(x['image'], y['image'])
