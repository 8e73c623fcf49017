"""Loss parity tests. The R1 double-backward is LaMa's trickiest training
ingredient (SURVEY §7 hard part No. 2): we verify our jax.vjp formulation
against torch.autograd.grad(create_graph=True) on the same tiny conv net —
both the penalty value and its gradient wrt discriminator weights."""
import numpy as np
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from lama_tpu.losses.adversarial import NonSaturatingWithR1, make_discrim_loss
from lama_tpu.losses.feature_matching import feature_matching_loss, masked_l1_loss


def test_masked_l1(rng):
    pred = rng.rand(2, 8, 8, 3).astype(np.float32)
    target = rng.rand(2, 8, 8, 3).astype(np.float32)
    mask = (rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    out = masked_l1_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask), 10.0, 0.0)
    w = mask * 0.0 + (1 - mask) * 10.0
    ref = (np.abs(pred - target) * w).mean()
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_feature_matching(rng):
    fake = [jnp.asarray(rng.rand(2, 8, 8, 4).astype(np.float32)) for _ in range(3)]
    real = [jnp.asarray(rng.rand(2, 8, 8, 4).astype(np.float32)) for _ in range(3)]
    out = feature_matching_loss(fake, real)
    ref = np.mean([np.mean((np.asarray(f) - np.asarray(r)) ** 2) for f, r in zip(fake, real)])
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_r1_penalty_and_double_grad_vs_torch(rng):
    """Tiny conv discriminator: D(x) = conv(x, w). Check gp value and
    d(gp)/dw against torch create_graph double backward."""
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    w = rng.randn(1, 3, 3, 3).astype(np.float32)

    # --- torch reference (the reference's make_r1_gp, adversarial.py:71-79)
    tx = torch.from_numpy(x).requires_grad_(True)
    tw = torch.from_numpy(w).requires_grad_(True)
    pred = TF.conv2d(tx, tw, padding=1)
    grad_real = torch.autograd.grad(pred.sum(), tx, create_graph=True)[0]
    gp = (grad_real.view(2, -1).norm(2, dim=1) ** 2).mean()
    gp.backward()
    ref_gp = gp.detach().numpy()
    ref_dgp_dw = tw.grad.numpy()

    # --- jax
    from lama_tpu.ops.conv import conv2d
    loss = NonSaturatingWithR1(gp_coef=1.0)
    kernel = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    jx = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    def gp_of_w(kernel):
        def d_fn(r):
            return conv2d(r, kernel, padding=1)
        _, gp = loss.r1_penalty(d_fn, jx)
        return gp

    gp_val, dgp_dk = jax.value_and_grad(gp_of_w)(kernel)
    np.testing.assert_allclose(float(gp_val), ref_gp, rtol=1e-4)
    np.testing.assert_allclose(np.transpose(np.asarray(dgp_dk), (3, 2, 0, 1)),
                               ref_dgp_dw, rtol=1e-3, atol=1e-4)


def test_nonsaturating_losses_match_torch(rng):
    fake_pred = rng.randn(2, 6, 6, 1).astype(np.float32)
    real_pred = rng.randn(2, 6, 6, 1).astype(np.float32)
    mask = (rng.rand(2, 6, 6, 1) > 0.5).astype(np.float32)

    loss = make_discrim_loss('r1', weight=10, gp_coef=0.001,
                             mask_as_fake_target=True, allow_scale_mask=True)
    g_loss, _ = loss.generator_loss(jnp.asarray(fake_pred), jnp.asarray(mask))
    ref_g = TF.softplus(-torch.from_numpy(fake_pred)).mean().numpy() * 10
    np.testing.assert_allclose(float(g_loss), ref_g, rtol=1e-5)

    gp = jnp.float32(0.123)
    d_loss, metrics = loss.discriminator_loss(jnp.asarray(real_pred),
                                              jnp.asarray(fake_pred), gp,
                                              jnp.asarray(mask))
    tm = torch.from_numpy(mask)
    tf_ = torch.from_numpy(fake_pred)
    fake_l = TF.softplus(tf_) * tm + (1 - tm) * TF.softplus(-tf_)
    ref_d = (TF.softplus(-torch.from_numpy(real_pred)) + fake_l).mean().numpy() + 0.123 * 0.001
    np.testing.assert_allclose(float(d_loss), ref_d, rtol=1e-5)


def test_mask_interpolation_to_discriminator_size(rng):
    """allow_scale_mask: mask downscaled (nearest) to score-map size
    (reference adversarial.py:61-69)."""
    loss = make_discrim_loss('r1', weight=1, gp_coef=0.1, mask_as_fake_target=True,
                             allow_scale_mask=True)
    mask = jnp.asarray((rng.rand(1, 16, 16, 1) > 0.5).astype(np.float32))
    fake_pred = jnp.asarray(rng.randn(1, 4, 4, 1).astype(np.float32))
    real_pred = jnp.asarray(rng.randn(1, 4, 4, 1).astype(np.float32))
    d_loss, _ = loss.discriminator_loss(real_pred, fake_pred, jnp.float32(0.0), mask)
    assert np.isfinite(float(d_loss))
