"""Op-level parity tests vs torch functional primitives (torch CPU is the
golden oracle for the semantics the reference relies on: conv2d with reflect
padding, strided/dilated/grouped conv, ConvTranspose2d(k3 s2 p1 op1),
BatchNorm2d train/eval, F.interpolate bilinear/nearest, avg/max pooling)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp
import jax.random

from lama_tpu.ops.conv import (adaptive_avg_pool2d, avg_pool2d, conv2d,
                               conv_transpose2d, max_pool2d)
from lama_tpu.ops.norm import BatchNorm
from lama_tpu.ops.pad import pad2d
from lama_tpu.ops.resize import interpolate


def to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def torch_kernel_to_hwio(w):
    # torch conv weight (O, I, kh, kw) -> HWIO
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


@pytest.mark.parametrize('stride,padding,dilation,groups,mode', [
    (1, 1, 1, 1, 'zeros'),
    (2, 1, 1, 1, 'zeros'),
    (1, 2, 2, 1, 'zeros'),
    (1, 1, 1, 4, 'zeros'),
    (1, 3, 1, 1, 'reflect'),
    (2, 1, 1, 1, 'reflect'),
    (1, 1, 1, 1, 'replicate'),
])
def test_conv2d_matches_torch(rng, stride, padding, dilation, groups, mode):
    x = rng.randn(2, 8, 16, 16).astype(np.float32)
    w = rng.randn(12, 8 // groups, 3, 3).astype(np.float32)
    b = rng.randn(12).astype(np.float32)

    tx = torch.from_numpy(x)
    if mode == 'zeros':
        ref = TF.conv2d(tx, torch.from_numpy(w), torch.from_numpy(b),
                        stride=stride, padding=padding, dilation=dilation, groups=groups)
    else:
        tmode = {'reflect': 'reflect', 'replicate': 'replicate'}[mode]
        padded = TF.pad(tx, [padding] * 4, mode=tmode)
        ref = TF.conv2d(padded, torch.from_numpy(w), torch.from_numpy(b),
                        stride=stride, padding=0, dilation=dilation, groups=groups)

    out = conv2d(to_nhwc(x), torch_kernel_to_hwio(w), jnp.asarray(b),
                 stride=stride, padding=padding, dilation=dilation, groups=groups,
                 padding_mode=mode)
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('k,s,p,op', [(3, 2, 1, 1), (4, 2, 1, 0), (2, 2, 0, 0)])
def test_conv_transpose2d_matches_torch(rng, k, s, p, op):
    x = rng.randn(2, 6, 9, 11).astype(np.float32)
    w = rng.randn(6, 5, k, k).astype(np.float32)  # torch convT: (in, out, kh, kw)
    b = rng.randn(5).astype(np.float32)
    ref = TF.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(b), stride=s, padding=p, output_padding=op)
    # HWIO with I=in, O=out
    kernel = jnp.asarray(np.transpose(w, (2, 3, 0, 1)))
    out = conv_transpose2d(to_nhwc(x), kernel, jnp.asarray(b),
                           stride=s, padding=p, output_padding=op)
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_batchnorm_train_and_eval_match_torch(rng):
    x1 = rng.randn(4, 7, 5, 6).astype(np.float32)
    x2 = rng.randn(4, 7, 5, 6).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(7)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.randn(7).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.randn(7).astype(np.float32)))

    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), to_nhwc(x1), use_running_average=False)
    variables = {
        'params': {'scale': jnp.asarray(tbn.weight.detach().numpy()),
                   'bias': jnp.asarray(tbn.bias.detach().numpy())},
        'batch_stats': variables['batch_stats'],
    }

    # two train steps update running stats identically
    for x in (x1, x2):
        tbn.train()
        ref = tbn(torch.from_numpy(x)).detach().numpy()
        out, updates = bn.apply(variables, to_nhwc(x), use_running_average=False,
                                mutable=['batch_stats'])
        variables = {'params': variables['params'], 'batch_stats': updates['batch_stats']}
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(np.asarray(variables['batch_stats']['mean']),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(variables['batch_stats']['var']),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    tbn.eval()
    ref = tbn(torch.from_numpy(x1)).detach().numpy()
    out = bn.apply(variables, to_nhwc(x1), use_running_average=True)
    np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('mode,size', [
    ('nearest', (7, 9)), ('nearest', (20, 24)),
    ('bilinear', (7, 9)), ('bilinear', (20, 24)),
])
def test_interpolate_matches_torch(rng, mode, size):
    x = rng.randn(2, 3, 10, 12).astype(np.float32)
    kwargs = {} if mode == 'nearest' else {'align_corners': False}
    ref = TF.interpolate(torch.from_numpy(x), size=size, mode=mode, **kwargs).numpy()
    out = interpolate(to_nhwc(x), size=size, mode=mode)
    np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-4, atol=1e-4)


def test_pools_match_torch(rng):
    x = rng.randn(2, 5, 8, 8).astype(np.float32)
    ref = TF.avg_pool2d(torch.from_numpy(x), 2, 2).numpy()
    np.testing.assert_allclose(from_nhwc(avg_pool2d(to_nhwc(x), 2, 2)), ref, rtol=1e-5, atol=1e-5)
    ref = TF.max_pool2d(torch.from_numpy(x), 2, 2).numpy()
    np.testing.assert_allclose(from_nhwc(max_pool2d(to_nhwc(x), 2, 2)), ref, rtol=1e-5, atol=1e-5)
    ref = TF.adaptive_avg_pool2d(torch.from_numpy(x), (1, 1)).numpy()
    np.testing.assert_allclose(from_nhwc(adaptive_avg_pool2d(to_nhwc(x), 1)), ref, rtol=1e-5, atol=1e-5)


def test_pad2d_matches_torch(rng):
    x = rng.randn(1, 3, 6, 6).astype(np.float32)
    for tmode, jmode in [('reflect', 'reflect'), ('replicate', 'replicate'), ('constant', 'zeros')]:
        ref = TF.pad(torch.from_numpy(x), [2, 2, 3, 3], mode=tmode).numpy()
        out = pad2d(to_nhwc(x), ((3, 3), (2, 2)), mode=jmode)
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-6, atol=1e-6)



def test_batchnorm_global_stats_under_sharded_batch(rng):
    """Pins the train-time BN divergence documented in docs/MIGRATION.md:
    under jit + GSPMD with the batch axis sharded over the mesh, batch
    statistics are computed over the GLOBAL batch (sync-BN semantics), i.e.
    identical to the unsharded single-device result — NOT the reference's
    per-device DDP statistics."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x = rng.randn(8, 4, 4, 6).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        use_running_average=False)

    def step(v, xx):
        return bn.apply(v, xx, use_running_average=False,
                        mutable=['batch_stats'])

    # unsharded ground truth
    y_ref, upd_ref = jax.jit(step)(variables, jnp.asarray(x))

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=('data',))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P('data')))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    y_sh, upd_sh = jax.jit(step)(vs, xs)

    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(upd_sh['batch_stats']['mean']),
        np.asarray(upd_ref['batch_stats']['mean']), rtol=1e-6, atol=1e-6)
    # and the global mean really is the full-batch mean
    np.testing.assert_allclose(
        np.asarray(upd_sh['batch_stats']['mean']),
        0.9 * 0 + 0.1 * x.mean(axis=(0, 1, 2)), rtol=1e-5, atol=1e-6)
