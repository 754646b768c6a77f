"""Native C++ host-preprocessing library vs numpy/cv2 reference."""
import numpy as np
import pytest

from climategan_tpu.utils import native


def test_native_builds_and_packs():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (33, 47, 3), np.uint8)
    got = native.pack_uint8_to_m11(img)
    want = img.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_prepare_inference_matches_cv2():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    import cv2

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (97, 145, 3), np.uint8)
    got = native.prepare_inference(img, target=64)
    assert got.shape == (64, 64, 3)

    h, w = 97, 145
    nh, nw = int(round(h * 64 / w)), 64
    if h < w:
        nh, nw = 64, int(round(w * 64 / h))
    ref = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top, left = (nh - 64) // 2, (nw - 64) // 2
    ref = ref[top: top + 64, left: left + 64].astype(np.float32) / 127.5 - 1.0
    # cv2 uses fixed-point bilinear; allow 1-2 LSB of uint8 difference
    assert np.abs(got - ref).max() <= 3.0 / 127.5
