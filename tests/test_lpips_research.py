"""LPIPS research tail (reference evaluation/losses/lpips.py:436-697):
2AFC / JND dataset scoring, VOC AP, L2/DSSIM FakeNet baselines, the
Dist2LogitLayer ranking head."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lama_tpu.evaluation.lpips_research import (
    Dist2LogitLayer, DSSIMScore, L2Score, bce_ranking_loss, dssim, l2, psnr,
    rgb2lab, score_2afc_dataset, score_jnd_dataset, voc_ap)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_score_2afc_agreement_math():
    # three triplets with known distances: d(ref,p0) vs d(ref,p1)
    def dist(a, b):
        return np.abs(a - b).reshape(a.shape[0], -1).mean(axis=1)

    ref = np.zeros((3, 4, 4, 3), np.float32)
    p0 = np.zeros_like(ref)
    p1 = np.zeros_like(ref)
    p0[0] += 0.1; p1[0] += 0.5   # p0 closer, humans prefer p0 (judge 0) -> 1
    p0[1] += 0.5; p1[1] += 0.1   # p1 closer, humans prefer p0 (judge 0) -> 0
    # exact tie -> 0.5 regardless of judge
    score, detail = score_2afc_dataset(
        [dict(ref=ref, p0=p0, p1=p1, judge=np.array([0.0, 0.0, 0.3]))], dist)
    np.testing.assert_allclose(detail['scores'], [1.0, 0.0, 0.5])
    assert score == pytest.approx(0.5)


def test_score_2afc_fractional_judge():
    def dist(a, b):
        return np.abs(a - b).reshape(a.shape[0], -1).mean(axis=1)

    ref = np.zeros((1, 4, 4, 3), np.float32)
    p0 = ref + 0.1
    p1 = ref + 0.5
    # 60% of humans preferred p1 but the metric says p0 -> credit 0.4
    score, _ = score_2afc_dataset(
        [dict(ref=ref, p0=p0, p1=p1, judge=np.array([0.6]))], dist)
    assert score == pytest.approx(0.4)


def test_score_jnd_perfect_and_inverted_ranking():
    # 'same' pairs have small distance -> perfect ranking -> AP 1.0
    data = dict(p0=np.zeros((4, 2, 2, 3), np.float32),
                p1=np.zeros((4, 2, 2, 3), np.float32),
                same=np.array([1.0, 1.0, 0.0, 0.0]))
    ds = {'good': np.array([0.1, 0.2, 0.8, 0.9]),
          'bad': np.array([0.9, 0.8, 0.2, 0.1])}

    def make(key):
        it = iter([ds[key]])
        return lambda a, b: next(it)

    ap_good, detail = score_jnd_dataset([data], make('good'))
    assert ap_good == pytest.approx(1.0)
    assert np.all(np.diff(detail['ds']) >= 0)
    ap_bad, _ = score_jnd_dataset([data], make('bad'))
    assert ap_bad < 0.6


def test_voc_ap_known_value():
    # single positive ranked first among two: prec [1, .5], rec [1, 1]
    assert voc_ap(np.array([1.0, 1.0]), np.array([1.0, 0.5])) == \
        pytest.approx(1.0)
    # positive ranked second: prec [0, .5], rec [0, 1]
    assert voc_ap(np.array([0.0, 1.0]), np.array([0.0, 0.5])) == \
        pytest.approx(0.5)
    # 2007 11-point variant stays in [0,1] and orders the same way
    assert voc_ap(np.array([0.0, 1.0]), np.array([0.0, 0.5]),
                  use_07_metric=True) < \
        voc_ap(np.array([1.0, 1.0]), np.array([1.0, 0.5]),
               use_07_metric=True)


def test_rgb2lab_reference_points():
    lab = rgb2lab(np.array([[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0],
                             [1.0, 0.0, 0.0]]], np.float32))
    np.testing.assert_allclose(lab[0, 0], [100.0, 0.0, 0.0], atol=0.2)
    np.testing.assert_allclose(lab[0, 1], [0.0, 0.0, 0.0], atol=1e-3)
    # sRGB red (D65): L*≈53.2, a*≈80.1, b*≈67.2
    np.testing.assert_allclose(lab[0, 2], [53.24, 80.09, 67.20], atol=0.2)


def test_l2_psnr_dssim_scalars(rng):
    a = rng.rand(16, 16, 3).astype(np.float32) * 255.0
    assert l2(a, a) == 0.0
    assert psnr(a, a) > 100.0
    assert dssim(a, a) == pytest.approx(0.0, abs=1e-5)
    b = np.clip(a + rng.randn(16, 16, 3) * 40, 0, 255).astype(np.float32)
    assert 0.0 < l2(a, b) < 1.0
    assert 0.0 < dssim(a, b) <= 0.5 + 1e-6
    assert psnr(a, b) < psnr(a, np.clip(a + 1, 0, 255))


@pytest.mark.parametrize('cls', [L2Score, DSSIMScore])
@pytest.mark.parametrize('colorspace', ['RGB', 'Lab'])
def test_fakenet_scorers_rank_by_distortion(cls, colorspace, rng):
    score = cls(colorspace=colorspace)
    img = rng.rand(2, 16, 16, 3).astype(np.float32)
    near = np.clip(img + rng.randn(*img.shape).astype(np.float32) * 0.01,
                   0, 1)
    far = np.clip(img + rng.randn(*img.shape).astype(np.float32) * 0.3, 0, 1)
    d_self = score(img, img)
    d_near = score(img, near)
    d_far = score(img, far)
    assert d_self.shape == (2,)
    assert np.all(d_self <= d_near + 1e-6)
    assert np.all(d_near < d_far)


def test_fakenet_rejects_unknown_colorspace():
    with pytest.raises(ValueError, match='colorspace'):
        L2Score(colorspace='HSV')


def test_2afc_with_lpips_distance(rng):
    """End-to-end: score a tiny 2AFC set with the repo's LPIPS metric (random
    trunk — only the ranking property is asserted)."""
    from lama_tpu.evaluation.lpips import LPIPS
    metric = LPIPS(net='squeeze')

    def dist(a, b):
        return np.asarray(metric(jnp.asarray(a), jnp.asarray(b)))

    ref = rng.rand(2, 32, 32, 3).astype(np.float32)
    p0 = np.clip(ref + rng.randn(*ref.shape).astype(np.float32) * 0.02, 0, 1)
    p1 = np.clip(ref + rng.randn(*ref.shape).astype(np.float32) * 0.5, 0, 1)
    # humans always prefer the mild perturbation (p0 -> judge 0)
    score, _ = score_2afc_dataset(
        [dict(ref=ref, p0=p0, p1=p1, judge=np.zeros(2))], dist)
    assert score == pytest.approx(1.0)


def test_dist2logit_head_and_ranking_loss(rng):
    layer = Dist2LogitLayer(chn_mid=8)
    d0 = jnp.asarray(rng.rand(6).astype(np.float32))
    d1 = jnp.asarray(rng.rand(6).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), d0, d1)
    p = layer.apply(variables, d0, d1)
    assert p.shape == (6,)
    assert np.all((np.asarray(p) >= 0) & (np.asarray(p) <= 1))

    judge = jnp.asarray(rng.choice([-1.0, 1.0], 6).astype(np.float32))
    loss0 = bce_ranking_loss(layer.apply(variables, d0, d1), judge)
    assert np.isfinite(float(loss0))

    # a few SGD steps must reduce the loss (the head is trainable, the
    # reference's BCERankingLoss/optimize_parameters role)
    import optax
    opt = optax.adam(1e-2)

    def loss_fn(v):
        return bce_ranking_loss(layer.apply(v, d0, d1), judge)

    state = opt.init(variables)
    v = variables
    for _ in range(60):
        g = jax.grad(loss_fn)(v)
        upd, state = opt.update(g, state)
        v = optax.apply_updates(v, upd)
    assert float(loss_fn(v)) < float(loss0) * 0.7
