"""Misc parity/regression tests: train-step determinism trajectory,
LearnableSpatialTransformWrapper round-trip (the reference's inline self-test,
spatial_transform.py:43-49), countless3d, OurPrecomputed dataset layout."""
import numpy as np

import jax
import jax.numpy as jnp


def test_train_step_deterministic_trajectory(rng):
    """Same seed + same data -> bitwise-identical 3-step trajectories.
    Guards against nondeterminism creeping into the fused GAN step."""
    from lama_tpu.losses.adversarial import make_discrim_loss
    from lama_tpu.models.ffc import FFCResNetGenerator
    from lama_tpu.models.pix2pixhd import NLayerDiscriminator
    from lama_tpu.training.state import create_train_state, make_optimizer
    from lama_tpu.training.step import EMAConfig, InpaintingTrainStep, LossConfig

    gen = FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=8, n_downsampling=2, n_blocks=1,
        add_out_act='sigmoid',
        init_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        downsample_conv_kwargs=dict(ratio_gin=0, ratio_gout=0, enable_lfu=False),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False))
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    adv = make_discrim_loss('r1', weight=10, gp_coef=0.001,
                            mask_as_fake_target=True, allow_scale_mask=True)
    g_tx = make_optimizer('adam', lr=1e-3)
    d_tx = make_optimizer('adam', lr=1e-4)
    step = jax.jit(InpaintingTrainStep(gen, disc, adv, g_tx, d_tx,
                                       loss_config=LossConfig(resnet_pl_weight=0),
                                       ema=EMAConfig(enabled=False)))
    batch = {'image': jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)),
             'mask': jnp.asarray((rng.rand(2, 32, 32, 1) > 0.8).astype(np.float32))}

    def run():
        state = create_train_state(jax.random.PRNGKey(7), gen, disc, batch,
                                   g_tx, d_tx, use_ema=False)
        losses = []
        for i in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append((float(metrics['gen_total']), float(metrics['discr_total'])))
        return losses, jax.device_get(state.g_params)

    losses1, params1 = run()
    losses2, params2 = run()
    assert losses1 == losses2
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(a, b)
    # qualitative dynamics: finite, nonzero losses
    assert all(np.isfinite(v) for pair in losses1 for v in pair)


def test_spatial_transform_wrapper_roundtrip():
    """Identity inner module => output equals input away from the border
    (reference spatial_transform.py:43-49 self-test)."""
    from flax import linen as nn
    from lama_tpu.models.ffc import LearnableSpatialTransformWrapper

    class Identity(nn.Module):
        def __call__(self, x, train=False):
            return x

    layer = LearnableSpatialTransformWrapper(Identity(), angle_init_range=80.0)
    x = jnp.arange(2 * 3 * 15 * 15, dtype=jnp.float32).reshape(2, 15, 15, 3)
    variables = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(variables, x)
    assert y.shape == x.shape
    # rotate-then-unrotate is bilinear twice: exact only up to interpolation
    # error, which concentrates at the borders; check the interior loosely
    np.testing.assert_allclose(np.asarray(y)[:, 3:-3, 3:-3],
                               np.asarray(x)[:, 3:-3, 3:-3], rtol=2e-2, atol=1.0)


def test_countless3d(rng):
    from lama_tpu.evaluation.countless import countless3d
    data = np.repeat(np.repeat(np.repeat(
        rng.randint(0, 4, (4, 4, 4)), 2, 0), 2, 1), 2, 2).astype(np.uint8)
    out = countless3d(data)
    np.testing.assert_array_equal(out, data[::2, ::2, ::2])
    block = np.zeros((2, 2, 2), np.uint8)
    block.ravel()[:] = [5, 5, 5, 1, 2, 3, 4, 6]
    assert countless3d(block)[0, 0, 0] == 5


def test_our_precomputed_dataset(tmp_path, rng):
    from lama_tpu.data.datasets import OurPrecomputedInpaintingResultsDataset
    from lama_tpu.data.io import save_image
    (tmp_path / 'mask').mkdir()
    (tmp_path / 'img').mkdir()
    (tmp_path / 'pred').mkdir()
    img = rng.rand(20, 20, 3).astype(np.float32)
    save_image(str(tmp_path / 'img' / 'scene.png'), img)
    save_image(str(tmp_path / 'mask' / 'scene_mask001.png'),
               (rng.rand(20, 20, 1) > 0.5).astype(np.float32))
    save_image(str(tmp_path / 'pred' / 'scene_mask001_inpainted.png'), img)
    ds = OurPrecomputedInpaintingResultsDataset(str(tmp_path), str(tmp_path / 'pred'))
    assert len(ds) == 1
    item = ds[0]
    assert set(item) >= {'image', 'mask', 'inpainted'}
