"""Toeplitz-matmul Gaussian blur vs direct torch conv (kornia semantics)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from climategan_tpu.ops.blur import gaussian_blur, gaussian_kernel_1d


def _torch_blur(x_nhwc, ksize, sigma):
    k1 = torch.from_numpy(gaussian_kernel_1d(ksize, sigma)).double()
    k2 = torch.outer(k1, k1)[None, None]
    t = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).double()
    r = (ksize - 1) // 2
    t = F.pad(t, (r, r, r, r), mode="reflect")
    y = F.conv2d(t, k2)
    return y.permute(0, 2, 3, 1).numpy()


def test_gaussian_blur_matches_direct_conv():
    rng = np.random.RandomState(0)
    x = (rng.rand(1, 40, 40, 1) > 0.7).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(x), 15, 7.25))
    want = _torch_blur(x, 15, 7.25).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gaussian_blur_large_kernel_reflect():
    # kernel bigger than half the image exercises multi-fold reflection
    rng = np.random.RandomState(1)
    x = rng.rand(1, 32, 32, 1).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(x), 31, 15.5))
    want = _torch_blur(x, 31, 15.5).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
