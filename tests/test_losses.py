"""Loss golden tests vs torch (reference losses.py semantics)."""
import numpy as np
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from climategan_tpu import losses as L


def nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


def test_bce_with_logits():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 4, 4, 1).astype(np.float32)
    target = (rng.rand(2, 4, 4, 1) > 0.5).astype(np.float32)
    got = float(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(target)))
    want = float(tF.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target)))
    assert abs(got - want) < 1e-6


def test_cross_entropy():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, 4, 5).astype(np.float32)
    target = rng.randint(0, 5, (2, 4, 4))
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    want = float(tF.cross_entropy(nchw(logits), torch.from_numpy(target)))
    assert abs(got - want) < 1e-6


def test_tv_loss():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 6, 5, 2).astype(np.float32)
    got = float(L.tv_loss(jnp.asarray(x)))
    t = nchw(x)
    n, c, h, w = t.shape
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    h_tv = ((t[:, :, 1:, :] - t[:, :, :-1, :]) ** 2).sum()
    w_tv = ((t[:, :, :, 1:] - t[:, :, :, :-1]) ** 2).sum()
    want = float(2 * (h_tv / count_h + w_tv / count_w) / n)
    assert abs(got - want) / abs(want) < 1e-5


def test_minent_v1_v2():
    rng = np.random.RandomState(3)
    prob = rng.rand(2, 4, 4, 3).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    t = nchw(prob)
    n, c, h, w = t.shape
    ent = -t * torch.log2(t + 1e-30) / np.log2(c)
    want1 = float(ent.sum() / (n * h * w))
    got1 = float(L.minent_loss(jnp.asarray(prob), version=1))
    assert abs(got1 - want1) < 1e-6

    lam = 0.1
    demean = ent - ent.sum() / (n * h * w)
    want2 = float((ent + lam * demean * demean).sum() / (n * h * w))
    got2 = float(L.minent_loss(jnp.asarray(prob), version=2, lambda_var=lam))
    assert abs(got2 - want2) < 1e-6


def test_dada_depth_loss_berhu():
    rng = np.random.RandomState(4)
    pred = rng.rand(2, 8, 8, 1).astype(np.float32)
    label = rng.rand(2, 8, 8, 1).astype(np.float32)
    got = float(L.dada_depth_loss(jnp.asarray(pred), jnp.asarray(label)))

    p = torch.from_numpy(pred).squeeze()
    t = torch.from_numpy(label).squeeze()
    adiff = (p - t).abs()
    bmax = 0.2 * adiff.max().item()
    t1 = adiff * (adiff <= bmax).float()
    t2 = ((adiff ** 2 + bmax ** 2) / (2 * bmax)) * (adiff > bmax).float()
    want = float((t1.sum() + t2.sum()) / p.numel())
    assert abs(got - want) / abs(want) < 1e-5


def test_sigm_loss_matches_torch_twin():
    rng = np.random.RandomState(5)
    pred = rng.rand(2, 16, 16, 1).astype(np.float32)
    target = rng.rand(2, 16, 16, 1).astype(np.float32)
    got = float(L.sigm_loss(jnp.asarray(pred), jnp.asarray(target),
                            gmweight=0.5, scale=2))

    p, t = nchw(pred), nchw(target)
    tp, tt = p.median(), t.median()
    sp = (p - tp).abs().mean()
    st = (t - tt).abs().mean()
    R = (p - tp) / sp - (t - tt) / st
    sobelx = torch.tensor([[1., 0., -1.], [2., 0., -2.], [1., 0., -1.]])
    sobely = sobelx.t()
    num_pix = 16 * 16
    gm = 0.0
    batch = pred.shape[0]
    for k in range(2):
        Rk = tF.interpolate(R, scale_factor=1 / 2 ** k) if k else R
        # the reference expands the kernels to batch_size output channels
        # (losses.py:264-271) so gm is summed batch_size times
        kx = sobelx.expand(batch, 1, 3, 3)
        ky = sobely.expand(batch, 1, 3, 3)
        gm += (tF.conv2d(Rk, kx).abs() + tF.conv2d(Rk, ky).abs()).sum()
    want = float(0.5 / num_pix * R.abs().sum() + 0.5 / num_pix * gm)
    assert abs(got - want) / abs(want) < 1e-4


def test_gan_loss_lists_and_flip():
    rng = np.random.RandomState(6)
    # multiscale structure: list of per-scale feature lists
    pred = [[jnp.asarray(rng.randn(2, 4, 4, 1).astype(np.float32))
             for _ in range(3)] for _ in range(2)]
    # no smoothing/flipping -> plain BCE vs ones on final preds
    got = float(L.gan_loss(pred, True, rng=None, use_lsgan=False))
    want = np.mean([
        float(tF.binary_cross_entropy_with_logits(
            torch.from_numpy(np.asarray(p[-1])),
            torch.ones(2, 4, 4, 1)))
        for p in pred
    ])
    assert abs(got - want) < 1e-6


def test_feat_match_excludes_final():
    rng = np.random.RandomState(7)
    real = [[jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
             for _ in range(3)]]
    fake = [[jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
             for _ in range(3)]]
    got = float(L.feat_match_loss(real, fake))
    want = np.mean(np.abs(np.asarray(real[0][0]) - np.asarray(fake[0][0]))) \
        + np.mean(np.abs(np.asarray(real[0][1]) - np.asarray(fake[0][1])))
    assert abs(got - want) < 1e-5


def test_hinge_loss_matches_torch_semantics():
    rng = np.random.RandomState(8)
    pred = [[jnp.asarray(rng.randn(2, 4, 4, 1).astype(np.float32))]
            for _ in range(2)]
    # discriminator, real: -mean(min(x-1, 0)) per scale, averaged
    got = float(L.hinge_loss(pred, True, for_discriminator=True))
    want = np.mean([
        float(-torch.minimum(torch.from_numpy(np.asarray(p[-1])) - 1,
                             torch.zeros(1)).mean())
        for p in pred
    ])
    assert abs(got - want) < 1e-6
    # generator: -mean(x)
    got_g = float(L.hinge_loss(pred, True, for_discriminator=False))
    want_g = np.mean([-np.asarray(p[-1]).mean() for p in pred])
    assert abs(got_g - want_g) < 1e-6


def test_context_reconstruction_ground_intersection():
    rng = np.random.RandomState(9)
    a = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    m = jnp.asarray((rng.rand(1, 4, 4, 1) > 0.5).astype(np.float32))
    ctx = float(L.context_loss(a, b, m))
    rec = float(L.reconstruction_loss(a, b, m))
    full = float(L.l1_loss(a, b))
    # context (outside mask) + reconstruction (inside) partition |a-b|
    assert abs((ctx + rec) - full) < 1e-5

    pred = jnp.asarray(rng.rand(1, 4, 4, 1).astype(np.float32))
    gt = jnp.asarray((rng.rand(1, 4, 4, 1) > 0.5).astype(np.float32))
    gi = float(L.ground_intersection_loss(pred, gt))
    want = float(np.mean((np.asarray(gt) - np.asarray(pred)) > 0.5))
    assert abs(gi - want) < 1e-6


def test_advent_loss_wgan_form():
    rng = np.random.RandomState(10)
    prob = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    prob = prob / prob.sum(-1, keepdims=True)

    captured = {}

    def disc(e):
        captured["in"] = e
        return e.mean(axis=-1, keepdims=True)

    loss = float(L.advent_loss(prob, 1.0, disc, "WGAN_norm"))
    ent = np.asarray(L.entropy_map(prob))
    np.testing.assert_allclose(np.asarray(captured["in"]), ent, rtol=1e-6)
    d_out = ent.mean(-1, keepdims=True)
    assert abs(loss - (-d_out.mean())) < 1e-6
