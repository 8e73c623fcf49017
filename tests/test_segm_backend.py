"""Default segmentation-mask backend tests (VERDICT round-1 item 6): the
ADE20k pseudo-panoptic predictor + SegmentationMask placement pipeline must
run end-to-end without detectron2, and segm_proba > 0 mask configs must work."""
import numpy as np
import pytest

from lama_tpu.evaluation.masks import SegmentationMask
from lama_tpu.evaluation.segm_backend import (ADE20kPanopticPredictor,
                                              ade20k_thing_class_ids)


class StubSegmentationModule:
    """Deterministic label map: stuff background (class 0 = wall) with two
    'thing' squares (person, class idx 12 0-based)."""

    def predict(self, images, seg_size=None):
        b, h, w, _ = images.shape
        labels = np.zeros((b, h, w), np.int32)
        labels[:, h // 8: h // 3, w // 8: w // 3] = 12
        labels[:, h // 2: h // 2 + h // 4, w // 2: w // 2 + w // 4] = 12
        return labels, None


def test_thing_class_table():
    things = ade20k_thing_class_ids()
    assert 12 in things      # person
    assert 0 not in things   # wall is stuff
    assert 20 < len(things) < 150


def test_backend_produces_instances():
    pred = ADE20kPanopticPredictor(segmentation_module=StubSegmentationModule())
    img = np.random.RandomState(0).rand(128, 128, 3).astype(np.float32)
    panoptic, info = pred(img)
    assert panoptic.shape == (128, 128)
    things = [s for s in info if s['isthing']]
    stuff = [s for s in info if not s['isthing']]
    assert len(things) == 2   # two connected components of the person class
    assert len(stuff) == 1
    for s in things:
        assert (panoptic == s['id']).any()


def test_segmentation_mask_placement_end_to_end():
    pred = ADE20kPanopticPredictor(segmentation_module=StubSegmentationModule())
    sm = SegmentationMask(predictor=pred, confidence_threshold=0.5,
                          max_object_area=0.5, min_mask_area=0.005,
                          downsample_levels=5, num_variants_per_mask=3,
                          max_mask_intersection=0.9, max_foreground_coverage=0.9,
                          max_foreground_intersection=0.9, max_hidden_area=0.5)
    img = np.random.RandomState(0).rand(128, 128, 3).astype(np.float32)
    masks = sm.get_masks(img)
    assert masks, 'placement search returned no masks'
    for m in masks:
        assert m.shape == (128, 128)
        assert set(np.unique(m)) <= {0, 1}


def test_random_segmentation_mask_generator_with_default_backend():
    """segm_proba > 0 path through the mixed generator (reference default
    train mask mixture) using the stubbed module."""
    from lama_tpu.data.masks import (MixedMaskGenerator,
                                     RandomSegmentationMaskGenerator)
    pred = ADE20kPanopticPredictor(segmentation_module=StubSegmentationModule())
    gen = RandomSegmentationMaskGenerator(
        predictor=pred, max_object_area=0.5, min_mask_area=0.005,
        downsample_levels=5, num_variants_per_mask=3,
        max_mask_intersection=0.9, max_foreground_coverage=0.9,
        max_foreground_intersection=0.9, max_hidden_area=0.5)
    img = np.random.RandomState(1).rand(3, 128, 128).astype(np.float32)
    mask = gen(img, rng=np.random.RandomState(0))
    assert mask.shape == (128, 128, 1)
    assert mask.max() == 1

    mixed = MixedMaskGenerator(irregular_proba=0, box_proba=0, segm_proba=1,
                               segm_kwargs=dict(
                                   predictor=pred, max_object_area=0.5,
                                   min_mask_area=0.005, downsample_levels=5,
                                   num_variants_per_mask=3,
                                   max_mask_intersection=0.9,
                                   max_foreground_coverage=0.9,
                                   max_foreground_intersection=0.9,
                                   max_hidden_area=0.5))
    mask2 = mixed(img, rng=np.random.RandomState(0))
    assert mask2.shape[:2] == (128, 128)


def test_segm_generator_accepts_shape_plus_raw_image():
    """The dataset call sites pass the (h, w) SHAPE as `img` and the pixels
    as `raw_image` (datasets.py train/web/segm loaders) — the segm generator
    must use raw_image then (round-4 regression: it crashed on the tuple),
    and must raise clearly when given only a shape."""
    from lama_tpu.data.masks import RandomSegmentationMaskGenerator
    pred = ADE20kPanopticPredictor(segmentation_module=StubSegmentationModule())
    kwargs = dict(predictor=pred, max_object_area=0.5, min_mask_area=0.005,
                  downsample_levels=5, num_variants_per_mask=3,
                  max_mask_intersection=0.9, max_foreground_coverage=0.9,
                  max_foreground_intersection=0.9, max_hidden_area=0.5)
    gen = RandomSegmentationMaskGenerator(**kwargs)
    img = np.random.RandomState(1).rand(128, 128, 3).astype(np.float32)
    mask = gen((128, 128), raw_image=img, rng=np.random.RandomState(0))
    assert mask.shape == (128, 128, 1)
    gen2 = RandomSegmentationMaskGenerator(**kwargs)
    with pytest.raises(ValueError, match='raw_image'):
        gen2((128, 128), rng=np.random.RandomState(0))


@pytest.mark.slow
def test_default_backend_random_weights_runs():
    """The real SegmentationModule with RANDOM weights: labels are arbitrary
    but the full pipeline (jit forward -> instancing -> placement) must run."""
    pred = ADE20kPanopticPredictor(weights_path=None, allow_random_weights=True)
    img = np.random.RandomState(0).rand(128, 128, 3).astype(np.float32)
    panoptic, info = pred(img)
    assert panoptic.shape == (128, 128)
    assert isinstance(info, list)
    sm = SegmentationMask(predictor=pred, downsample_levels=5)
    masks = sm.get_masks(img)  # may legitimately be empty with random labels
    assert isinstance(masks, list)


def test_default_backend_requires_real_weights():
    """ADVICE r2: without resolvable ADE20k weights the default predictor must
    fail loudly at module build time (not silently run with random weights)."""
    pred = ADE20kPanopticPredictor(weights_path='/nonexistent')
    with pytest.raises(RuntimeError, match='allow_random_weights'):
        _ = pred.module


def test_default_backend_rejects_partial_weights(tmp_path):
    """A partial download (encoder .pth present, decoder missing) must ALSO
    fail loudly — loading half a segmenter and leaving the decoder random
    silently breaks object placements (round-3 review finding)."""
    d = tmp_path / 'ade20k' / 'ade20k-resnet50dilated-ppm_deepsup'
    d.mkdir(parents=True)
    (d / 'encoder_epoch_20.pth').write_bytes(b'stub')
    pred = ADE20kPanopticPredictor(weights_path=str(tmp_path))
    with pytest.raises(RuntimeError, match='allow_random_weights'):
        _ = pred.module
