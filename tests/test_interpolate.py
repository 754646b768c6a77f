"""Golden-value parity: matmul resizes vs torch F.interpolate.

The whole framework leans on exact torch interpolation semantics
(SURVEY.md §7 hard part 3); these tests pin them against torch CPU.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from climategan_tpu.ops.interpolate import resize, upsample_nearest


def _torch_resize(x_nhwc, size, mode, align_corners):
    t = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).double()
    kwargs = {} if mode == "nearest" else {"align_corners": align_corners}
    y = F.interpolate(t, size=size, mode=mode, **kwargs)
    return y.permute(0, 2, 3, 1).numpy()


CASES = [
    ((7, 11), (14, 22), "nearest", False),
    ((8, 8), (5, 3), "nearest", False),
    ((10, 10), (7, 13), "bilinear", True),
    ((10, 10), (7, 13), "bilinear", False),
    ((5, 5), (384, 384), "bicubic", False),
    ((16, 12), (160, 160), "bilinear", True),
    ((160, 160), (640, 640), "bilinear", False),
]


@pytest.mark.parametrize("in_hw,out_hw,mode,ac", CASES)
def test_resize_matches_torch(in_hw, out_hw, mode, ac):
    rng = np.random.RandomState(0)
    x = rng.randn(2, in_hw[0], in_hw[1], 3).astype(np.float32)
    got = np.asarray(resize(jnp.asarray(x), out_hw, mode, align_corners=ac))
    want = _torch_resize(x, out_hw, mode, ac).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_upsample_nearest_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 5, 4).astype(np.float32)
    got = np.asarray(upsample_nearest(jnp.asarray(x), 2, 2))
    want = _torch_resize(x, (12, 10), "nearest", False).astype(np.float32)
    np.testing.assert_allclose(got, want)
