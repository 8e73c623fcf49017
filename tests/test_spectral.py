"""Parity tests for the DFT-as-matmul spectral engine (ops/spectral.py),
including the packed-complex variant (block-matrix re/im packing for full
MXU tile shapes). Reference semantics: torch.fft.rfftn/irfftn with
norm='ortho' (reference ffc.py:86,108), matched here against jnp.fft.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lama_tpu.ops import spectral


@pytest.fixture
def x():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(2, 16, 16, 6).astype(np.float32))


@pytest.mark.parametrize('norm', ['ortho', 'backward'])
def test_rfft2_dft_matches_fft(x, norm):
    fr, fi = spectral.rfft2_dft(x, norm=norm)
    ref = jnp.fft.rfft2(x, axes=(1, 2), norm=norm)
    np.testing.assert_allclose(fr, ref.real, atol=1e-4)
    np.testing.assert_allclose(fi, ref.imag, atol=1e-4)


@pytest.mark.parametrize('norm', ['ortho', 'backward'])
def test_packed_rfft2_matches_unpacked(x, norm):
    fr, fi = spectral.rfft2_dft(x, norm=norm)
    pr, pi = spectral.rfft2_dft_packed(x, norm=norm)
    np.testing.assert_allclose(pr, fr, atol=1e-4)
    np.testing.assert_allclose(pi, fi, atol=1e-4)


@pytest.mark.parametrize('norm', ['ortho', 'backward'])
def test_packed_irfft2_roundtrip(x, norm):
    fr, fi = spectral.rfft2_dft_packed(x, norm=norm)
    out = spectral.irfft2_dft_packed(fr, fi, s=x.shape[1:3], norm=norm)
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_packed_irfft2_matches_unpacked(x):
    # irfft of a spectrum that is NOT the transform of a real signal —
    # exercises the hermitian double-count weights identically on both paths
    rng = np.random.RandomState(1)
    fr = jnp.asarray(rng.randn(2, 16, 9, 6).astype(np.float32))
    fi = jnp.asarray(rng.randn(2, 16, 9, 6).astype(np.float32))
    a = spectral.irfft2_dft(fr, fi, s=(16, 16))
    b = spectral.irfft2_dft_packed(fr, fi, s=(16, 16))
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_packed_rectangular():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 32, 3).astype(np.float32))
    pr, pi = spectral.rfft2_dft_packed(x)
    ref = jnp.fft.rfft2(x, axes=(1, 2), norm='ortho')
    np.testing.assert_allclose(pr, ref.real, atol=1e-4)
    np.testing.assert_allclose(pi, ref.imag, atol=1e-4)
    out = spectral.irfft2_dft_packed(pr, pi, s=(8, 32))
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_flag_dispatch(x, monkeypatch):
    fr0, fi0 = spectral.rfft2_dft(x)
    monkeypatch.setattr(spectral, 'PACKED_DFT', True)
    fr1, fi1 = spectral.rfft2_dft(x)
    out = spectral.irfft2_dft(fr1, fi1, s=x.shape[1:3])
    np.testing.assert_allclose(fr1, fr0, atol=1e-4)
    np.testing.assert_allclose(fi1, fi0, atol=1e-4)
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_merge_sibling_convs_exact(monkeypatch):
    """FFC with MERGE_SIBLING_CONVS on must match the two-conv path exactly
    (conv is linear in the kernel's output axis)."""
    import jax
    from lama_tpu.models import ffc as ffc_mod
    from lama_tpu.models.ffc import FFCResnetBlock

    rng = np.random.RandomState(3)
    block = FFCResnetBlock(dim=32, padding_type='reflect', ratio_gin=0.75,
                           ratio_gout=0.75, enable_lfu=False)
    xl = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    xg = jnp.asarray(rng.randn(2, 16, 16, 24).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), (xl, xg), train=False)
    ol0, og0 = block.apply(variables, (xl, xg), train=False)
    monkeypatch.setattr(ffc_mod, 'MERGE_SIBLING_CONVS', True)
    ol1, og1 = block.apply(variables, (xl, xg), train=False)
    np.testing.assert_allclose(ol1, ol0, atol=2e-5)
    np.testing.assert_allclose(og1, og0, atol=2e-5)


def test_spectral_concat_layout_exact(monkeypatch):
    """FourierUnit with SPECTRAL_CONCAT_LAYOUT on must match the interleaved
    reference layout (kernel/BN params are permuted to compensate)."""
    import jax
    from lama_tpu.models import ffc as ffc_mod
    from lama_tpu.models.ffc import FourierUnit

    rng = np.random.RandomState(4)
    fu = FourierUnit(features=12)
    x = jnp.asarray(rng.randn(2, 16, 16, 12).astype(np.float32))
    variables = fu.init(jax.random.PRNGKey(0), x, train=False)
    # randomise BN stats/params so the permutation is actually exercised
    variables = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.5 + 1.0),
        variables)
    y0 = fu.apply(variables, x, train=False)
    monkeypatch.setattr(ffc_mod, 'SPECTRAL_CONCAT_LAYOUT', True)
    y1 = fu.apply(variables, x, train=False)
    np.testing.assert_allclose(y1, y0, atol=2e-5)


def test_spectral_concat_layout_train_mode(monkeypatch):
    """Concat layout in TRAIN mode: outputs, BN running-stat updates (stored
    interleaved) and parameter gradients must all match the reference
    interleaved path."""
    import jax
    from lama_tpu.models import ffc as ffc_mod
    from lama_tpu.models.ffc import FourierUnit

    rng = np.random.RandomState(5)
    fu = FourierUnit(features=12)
    x = jnp.asarray(rng.randn(2, 16, 16, 12).astype(np.float32))
    variables = fu.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = variables['params'], variables['batch_stats']

    def run(params, stats):
        out, mut = fu.apply({'params': params, 'batch_stats': stats}, x,
                            train=True, mutable=['batch_stats'])
        return out, mut['batch_stats']

    def loss(params, stats):
        out, _ = run(params, stats)
        return jnp.sum(out * out)

    monkeypatch.setattr(ffc_mod, 'SPECTRAL_CONCAT_LAYOUT', False)
    out0, stats0 = run(params, stats)
    g0 = jax.grad(loss)(params, stats)
    monkeypatch.setattr(ffc_mod, 'SPECTRAL_CONCAT_LAYOUT', True)
    out1, stats1 = run(params, stats)
    g1 = jax.grad(loss)(params, stats)

    np.testing.assert_allclose(out1, out0, atol=2e-5)
    for k in ('mean', 'var'):
        np.testing.assert_allclose(stats1['bn'][k], stats0['bn'][k], atol=2e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g1)}
    for p, v in flat0:
        np.testing.assert_allclose(flat1[jax.tree_util.keystr(p)], v,
                                   atol=3e-4, err_msg=jax.tree_util.keystr(p))


def test_permuted_batchnorm_pmean_matches_batchnorm():
    """PermutedBatchNorm with axis_name must agree with BatchNorm's SyncBN
    path (identity permutation) and with the permuted-storage contract."""
    import jax
    from functools import partial
    from lama_tpu.ops.norm import BatchNorm, PermutedBatchNorm

    rng = np.random.RandomState(6)
    n_dev = jax.device_count()
    c = 8
    x = jnp.asarray(rng.randn(n_dev, 2, 4, 4, c).astype(np.float32))
    perm = tuple(np.random.RandomState(7).permutation(c).tolist())
    inv = tuple(np.argsort(perm).tolist())

    bn = BatchNorm(axis_name='d')
    # input below is channel-indexed by `inv` (activation j = original
    # channel inv[j]), so the module's perm must be `inv` for stats to land
    # in original-channel storage order
    pbn = PermutedBatchNorm(perm=inv, axis_name='d')
    v_bn = bn.init(jax.random.PRNGKey(0), x[0], use_running_average=True)
    # permuted storage: stored[k] corresponds to activation channel inv[k]
    v_pbn = jax.tree_util.tree_map(lambda a: a, v_bn)

    def run_bn(xs):
        out, mut = bn.apply(v_bn, xs, use_running_average=False,
                            mutable=['batch_stats'])
        return out, mut['batch_stats']

    def run_pbn(xs):
        out, mut = pbn.apply(v_pbn, xs[..., jnp.asarray(inv)],
                             use_running_average=False,
                             mutable=['batch_stats'])
        return out[..., jnp.asarray(perm)], mut['batch_stats']

    out0, st0 = jax.pmap(run_bn, axis_name='d')(x)
    out1, st1 = jax.pmap(run_pbn, axis_name='d')(x)
    # pbn input was channel-permuted by inv, so activation channel j of the
    # pbn call is bn channel inv[j]; stored stats must then EQUAL bn's
    # (storage order is the original channel order).
    np.testing.assert_allclose(out1, out0, atol=1e-5)
    np.testing.assert_allclose(st1['mean'], st0['mean'], atol=1e-5)
    np.testing.assert_allclose(st1['var'], st0['var'], atol=1e-5)


@pytest.mark.parametrize('shape', [(1, 8, 9, 3), (1, 7, 8, 3), (1, 7, 9, 3)])
def test_packed_odd_sizes(shape):
    """Odd H/W hit the hermitian double-count edge weights differently
    (no shared Nyquist bin); packed and unpacked must agree with jnp.fft."""
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    pr, pi = spectral.rfft2_dft_packed(x)
    ref = jnp.fft.rfft2(x, axes=(1, 2), norm='ortho')
    np.testing.assert_allclose(pr, ref.real, atol=1e-4)
    np.testing.assert_allclose(pi, ref.imag, atol=1e-4)
    out = spectral.irfft2_dft_packed(pr, pi, s=x.shape[1:3])
    np.testing.assert_allclose(out, x, atol=1e-4)


@pytest.mark.parametrize('norm', ['ortho', 'backward'])
def test_stacked_rfft2_matches_unpacked(x, norm):
    fr, fi = spectral.rfft2_dft(x, norm=norm)
    sr, si = spectral.rfft2_dft_stacked(x, norm=norm)
    np.testing.assert_allclose(sr, fr, atol=1e-4)
    np.testing.assert_allclose(si, fi, atol=1e-4)


@pytest.mark.parametrize('norm', ['ortho', 'backward'])
def test_stacked_irfft2_roundtrip(x, norm):
    fr, fi = spectral.rfft2_dft_stacked(x, norm=norm)
    out = spectral.irfft2_dft_stacked(fr, fi, s=x.shape[1:3], norm=norm)
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_stacked_irfft2_matches_unpacked(x):
    # non-hermitian spectrum: exercises the double-count weights identically
    rng = np.random.RandomState(1)
    fr = jnp.asarray(rng.randn(2, 16, 9, 6).astype(np.float32))
    fi = jnp.asarray(rng.randn(2, 16, 9, 6).astype(np.float32))
    a = spectral.irfft2_dft(fr, fi, s=(16, 16))
    b = spectral.irfft2_dft_stacked(fr, fi, s=(16, 16))
    np.testing.assert_allclose(b, a, atol=1e-4)


@pytest.mark.parametrize('shape', [(1, 8, 32, 3), (1, 8, 9, 3), (1, 7, 8, 3),
                                   (1, 7, 9, 3)])
def test_stacked_rect_and_odd_sizes(shape):
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    sr, si = spectral.rfft2_dft_stacked(x)
    ref = jnp.fft.rfft2(x, axes=(1, 2), norm='ortho')
    np.testing.assert_allclose(sr, ref.real, atol=1e-4)
    np.testing.assert_allclose(si, ref.imag, atol=1e-4)
    out = spectral.irfft2_dft_stacked(sr, si, s=x.shape[1:3])
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_stacked_flag_dispatch(x, monkeypatch):
    fr0, fi0 = spectral.rfft2_dft(x)
    monkeypatch.setattr(spectral, 'STACKED_DFT', True)
    fr1, fi1 = spectral.rfft2_dft(x)
    out = spectral.irfft2_dft(fr1, fi1, s=x.shape[1:3])
    np.testing.assert_allclose(fr1, fr0, atol=1e-4)
    np.testing.assert_allclose(fi1, fi0, atol=1e-4)
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_spectral_fold_bn_exact(monkeypatch):
    """SPECTRAL_FOLD_BN folds running-stat BN into the 1x1 frequency conv at
    eval; must match the unfolded path (fp32: exact up to rounding). Uses
    non-trivial running stats so the fold is actually exercised."""
    import jax
    from lama_tpu.models import ffc as ffc_mod
    from lama_tpu.models.ffc import FourierUnit

    rng = np.random.RandomState(5)
    fu = FourierUnit(features=12)
    x = jnp.asarray(rng.randn(2, 16, 16, 12).astype(np.float32))
    variables = fu.init(jax.random.PRNGKey(0), x, train=False)
    # perturb stats/params away from the (0, 1) init
    variables = jax.tree.map(lambda a: a, variables)
    variables['batch_stats']['bn']['mean'] = jnp.asarray(
        rng.randn(24).astype(np.float32) * 0.3)
    variables['batch_stats']['bn']['var'] = jnp.asarray(
        0.5 + rng.rand(24).astype(np.float32))
    variables['params']['bn']['scale'] = jnp.asarray(
        1 + 0.2 * rng.randn(24).astype(np.float32))
    variables['params']['bn']['bias'] = jnp.asarray(
        0.1 * rng.randn(24).astype(np.float32))

    out0 = fu.apply(variables, x, train=False)
    monkeypatch.setattr(ffc_mod, 'SPECTRAL_FOLD_BN', True)
    out1 = fu.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-4, atol=1e-5)


def test_bf16_store_roundtrip(x):
    """store_bf16 (measured-quality serving lever, +9.5% on the int8
    headline program — BASELINE.md round 4): DFT intermediates stored in
    bf16. Off by default; on, the transform stays correct to bf16
    tolerance and is inert for fp32 operands."""
    fr0, fi0 = spectral.rfft2_dft(x)
    # fp32 operands: flag is inert, outputs stay fp32 and bit-identical
    fr_f32, fi_f32 = spectral.rfft2_dft(x, dtype=jnp.float32, store_bf16=True)
    assert fr_f32.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(fr_f32), np.asarray(fr0))
    # bf16 operands: outputs stored bf16, correct to bf16 tolerance
    fr1, fi1 = spectral.rfft2_dft(x, dtype=jnp.bfloat16, store_bf16=True)
    assert fr1.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(fr1, np.float32),
                               np.asarray(fr0), atol=0.05, rtol=0.05)
    out = spectral.irfft2_dft(fr1.astype(jnp.float32),
                              fi1.astype(jnp.float32), s=x.shape[1:3],
                              dtype=jnp.bfloat16, store_bf16=True)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(x),
                               atol=0.15)


def test_serving_loader_sets_bf16_store(tmp_path):
    """load_serving_model threads spectral_bf16_store into the generator's
    static ServingMode (no process globals) and rejects the inert fp32
    combination loudly."""
    import pytest as _pytest
    from lama_tpu.serving import load_serving_model
    from test_predict_cli import make_model_dir
    model_dir = make_model_dir(tmp_path)
    gen_a, _, _ = load_serving_model(str(model_dir), 'best', precision='int8',
                                     spectral_bf16_store=True)
    assert gen_a.mode.spectral_bf16_store is True and gen_a.mode.int8 is True
    gen_b, _, _ = load_serving_model(str(model_dir), 'best', precision='bf16')
    assert gen_b.mode.spectral_bf16_store is False
    assert gen_b.mode.int8 is False
    # the two differently-configured generators COEXIST: loading gen_b did
    # not mutate gen_a's mode (the round-4 global-flag failure mode)
    assert gen_a.mode.spectral_bf16_store is True and gen_a.mode.int8 is True
    with _pytest.raises(ValueError, match='spectral_bf16_store'):
        load_serving_model(str(model_dir), 'best', precision='fp32',
                           spectral_bf16_store=True)


def test_grads_bf16_adjoint_exact_fp32():
    """The custom-vjp adjoint (grads_bf16 path) equals jax autodiff of the
    plain DFT in fp32, where _es applies no bf16 rounding (the rounding is
    train-only and bf16-only). Pins the adjoint einsum algebra."""
    from lama_tpu.ops import spectral
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 10, 3).astype(np.float32))

    def loss_plain(x):
        fr, fi = spectral.rfft2_dft(x, dtype=jnp.float32)
        y = spectral.irfft2_dft(fr * 1.3 + 0.1, fi * 0.7, s=x.shape[1:3],
                                dtype=jnp.float32)
        return jnp.sum(y ** 2) + jnp.sum(fr * fi)

    def loss_g16(x):
        fr, fi = spectral.rfft2_dft(x, dtype=jnp.float32, grads_bf16=True)
        y = spectral.irfft2_dft(fr * 1.3 + 0.1, fi * 0.7, s=x.shape[1:3],
                                dtype=jnp.float32, grads_bf16=True)
        return jnp.sum(y ** 2) + jnp.sum(fr * fi)

    g0 = jax.grad(loss_plain)(x)
    g1 = jax.grad(loss_g16)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-5)


def test_grads_bf16_rounds_backward_under_bf16():
    """Under the bf16 compute policy the grads_bf16 backward rounds at the
    HBM boundary: gradients stay close to the fp32 adjoint (bf16 tolerance)
    and the primal output matches the store_bf16 forward exactly."""
    from lama_tpu.ops import spectral
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))

    fr_a, fi_a = spectral.rfft2_dft(x, dtype=jnp.bfloat16, store_bf16=True)
    fr_b, fi_b = spectral.rfft2_dft(x, dtype=jnp.bfloat16, store_bf16=True,
                                    grads_bf16=True)
    np.testing.assert_array_equal(np.asarray(fr_a, np.float32),
                                  np.asarray(fr_b, np.float32))

    def loss(x, g16):
        fr, fi = spectral.rfft2_dft(x, dtype=jnp.bfloat16, store_bf16=True,
                                    grads_bf16=g16)
        y = spectral.irfft2_dft(fr, fi, s=x.shape[1:3], dtype=jnp.bfloat16,
                                store_bf16=True, grads_bf16=g16)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_ref = jax.grad(lambda t: loss(t, False))(x)
    g_b16 = jax.grad(lambda t: loss(t, True))(x)
    err = np.abs(np.asarray(g_b16) - np.asarray(g_ref)).max()
    scale = np.abs(np.asarray(g_ref)).max()
    assert err <= 0.03 * scale, (err, scale)


def test_fourier_unit_spectral_bf16_grads_train_step():
    """spectral_bf16_grads threads through FourierUnit: train-mode gradients
    stay within bf16 rounding of the baseline; eval output is unchanged
    vs the plain module (flag inert outside training)."""
    from lama_tpu.models.ffc import FourierUnit
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))

    def make(g16):
        return FourierUnit(6, use_dft_matmul=True, dtype=jnp.bfloat16,
                           spectral_bf16_grads=g16)

    v = make(False).init(jax.random.PRNGKey(0), x, train=True)

    def loss(params, g16):
        fu = make(g16)
        out, _ = fu.apply({'params': params,
                           'batch_stats': v['batch_stats']}, x, train=True,
                          mutable=['batch_stats'])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ref = jax.grad(lambda p: loss(p, False))(v['params'])
    g_b16 = jax.grad(lambda p: loss(p, True))(v['params'])
    ref_k = np.asarray(g_ref['conv_layer']['kernel'])
    b16_k = np.asarray(g_b16['conv_layer']['kernel'])
    assert np.abs(b16_k - ref_k).max() <= 0.05 * (np.abs(ref_k).max() + 1e-6)
    # eval path identical with and without the flag
    out_a = make(False).apply(v, x, train=False)
    out_b = make(True).apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
