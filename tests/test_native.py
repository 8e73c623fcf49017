"""Native C++ data-path kernels: build, JPEG decode parity vs cv2,
batch decode threading, mask rasteriser properties + determinism."""
import cv2
import numpy as np
import pytest

from lama_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native lama_io not buildable here')


def _jpeg_bytes(rng, h=60, w=80):
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    ok, buf = cv2.imencode('.jpg', cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    return buf.tobytes()


def test_decode_jpeg_matches_cv2(rng):
    data = _jpeg_bytes(rng)
    out = native.decode_jpeg(data)
    assert out is not None and out.shape == (60, 80, 3)
    ref = cv2.cvtColor(cv2.imdecode(np.frombuffer(data, np.uint8),
                                    cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    # same JPEG, two decoders: tiny IDCT rounding differences allowed
    assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 2.0


def test_decode_jpeg_batch(rng):
    datas = [_jpeg_bytes(rng, 40 + 8 * i, 64) for i in range(6)]
    outs = native.decode_jpeg_batch(datas, n_threads=3)
    assert all(o is not None for o in outs)
    for i, o in enumerate(outs):
        assert o.shape == (40 + 8 * i, 64, 3)


def test_decode_jpeg_invalid():
    assert native.decode_jpeg(b'not a jpeg') is None


def test_native_irregular_mask(rng):
    m1 = native.draw_irregular_mask((128, 128), max_len=60, max_width=20,
                                    min_times=2, max_times=5, seed=42)
    m2 = native.draw_irregular_mask((128, 128), max_len=60, max_width=20,
                                    min_times=2, max_times=5, seed=42)
    m3 = native.draw_irregular_mask((128, 128), max_len=60, max_width=20,
                                    min_times=2, max_times=5, seed=43)
    assert m1.shape == (128, 128, 1)
    assert set(np.unique(m1)) <= {0.0, 1.0}
    assert m1.sum() > 0
    np.testing.assert_array_equal(m1, m2)       # deterministic per seed
    assert not np.array_equal(m1, m3)           # seed changes the mask


def test_native_rectangle_mask():
    m = native.draw_rectangle_mask((100, 100), margin=10, bbox_min_size=20,
                                   bbox_max_size=40, min_times=1, max_times=1,
                                   seed=7)
    assert m[:10].sum() == 0 and m[:, :10].sum() == 0
    assert m.sum() > 0
