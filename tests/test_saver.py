"""Saver mixin: HDR export must produce a readable HDR file in this
environment (EXR backends are absent -> Radiance .hdr fallback), matching
the reference's envmap export role (`systems/intrinsic_avatar.py:553-564`)."""

import numpy as np

from intrinsicavatar_tpu.utils import saver


def test_save_hdr_falls_back_to_radiance_hdr(tmp_path):
    img = np.random.default_rng(0).uniform(0.0, 4.0, (8, 16, 3)) \
        .astype(np.float32)
    out = saver.save_hdr(str(tmp_path / "envmap.exr"), img)
    # no EXR plugin ships here; the Radiance RGBE fallback must engage
    assert out.endswith((".exr", ".hdr"))
    if out.endswith(".hdr"):
        # imageio's own .hdr *reader* tonemaps to uint8; verify the float
        # payload with cv2 (BGR order), which decodes RGBE faithfully
        import cv2

        back = cv2.imread(out, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
        assert back is not None and back.dtype == np.float32
        back = np.asarray(back)[..., ::-1]
        assert back.shape == img.shape
        # RGBE stores a shared 8-bit exponent: ~1% error is expected
        assert np.allclose(back, img, rtol=0.02, atol=0.02)


def test_save_hdr_direct_hdr_path(tmp_path):
    img = np.ones((4, 8, 3), np.float32) * 2.5
    out = saver.save_hdr(str(tmp_path / "light.hdr"), img)
    assert out.endswith(".hdr")
