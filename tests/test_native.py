"""Tests: native C++ data-path kernels vs numpy/cv2 references."""

import numpy as np
import pytest

native = pytest.importorskip("intrinsicavatar_tpu.native")

if native.load() is None:
    pytest.skip("native build unavailable", allow_module_level=True)


def test_erode_dilate_matches_cv2(rng):
    import cv2

    m = (rng.uniform(size=(48, 64)) < 0.3).astype(np.uint8)
    for k in (3, 8, 16):
        er, di = native.erode_dilate(m, k)
        kern = np.ones((k, k), np.uint8)
        np.testing.assert_array_equal(er, cv2.erode(m, kern))
        np.testing.assert_array_equal(di, cv2.dilate(m, kern))


def test_native_edge_sampler_distribution(rng):
    H = W = 128
    m = np.zeros((H, W), np.float32)
    m[40:90, 50:100] = 1.0
    img = rng.normal(size=(H, W, 3)).astype(np.float32)
    s = native.NativeEdgeSampler(1000, 0.6, 0.3, 16,
                                 rng=np.random.default_rng(0))
    mask_s, img_s = s.sample(m, img)
    assert mask_s.shape == (1000,)
    assert img_s.shape == (1000, 3)
    # first 600 indices drawn from the fg mask
    assert mask_s[:600].mean() == 1.0
    # gathered rgb values are actual image rows
    flat = img.reshape(-1, 3)
    assert np.isin(img_s.round(4), flat.round(4)).all()


def test_prefetcher():
    def gen():
        for i in range(10):
            yield {"x": i}, float(i)

    pf = native.Prefetcher(gen(), depth=2)
    items = list(pf)
    assert len(items) == 10
    assert items[3][0]["x"] == 3
