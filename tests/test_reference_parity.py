"""Parity tests against the ACTUAL reference modules in /root/reference
(not hand-built twins): SPADE / SpectralNorm forwards vs climategan.norms,
painter forward vs climategan.painter, loss values vs climategan.losses,
ExtraAdam trajectory vs climategan.optim, and the pretrained-backbone
loading knob vs climategan.deeplab encoders.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from climategan_tpu.models.norms import SNConv, SPADE
from climategan_tpu.utils.convert import (
    VariableTree,
    assign_spade,
    assign_spectral_conv,
    convert_painter,
)

from tests.reference_import import AddictDict, ref

torch.manual_seed(0)


def nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).float()


def nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


# ---------------------------------------------------------------------------
# norms (reference climategan/norms.py:84-186)
# ---------------------------------------------------------------------------


def test_spade_forward_vs_reference():
    rnorms = ref("norms")
    tm = rnorms.SPADE("instance", 3, 16, 4).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.normal_(0, 0.3)

    m = SPADE(param_free_norm="instance", kernel_size=3, norm_nc=16,
              cond_nc=4)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 16).astype(np.float32)
    seg = rng.randn(2, 16, 16, 4).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(seg))
    vt = VariableTree(variables)
    sd = {f"sp.{k}": v for k, v in tm.state_dict().items()}
    assign_spade(vt, (), sd, "sp", param_free_norm="instance")
    variables = vt.result()

    got = np.asarray(m.apply(variables, jnp.asarray(x), jnp.asarray(seg)))
    want = nhwc(tm(nchw(x), nchw(seg)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_spectral_norm_forward_and_uv_advance_vs_reference():
    """Three consecutive train-mode forwards: outputs AND the u/v power-
    iteration state must track the reference exactly (norms.py:84-143)."""
    rnorms = ref("norms")
    tm = rnorms.SpectralNorm(torch.nn.Conv2d(8, 16, 3, padding=1))

    m = SNConv(16, (3, 3), padding=(1, 1), spectral=True, use_bias=True)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 10, 10, 8).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    vt = VariableTree(variables)
    sd = {f"c.{k}": v for k, v in tm.state_dict().items()}
    assign_spectral_conv(vt, (), sd, "c")
    variables = vt.result()

    for step in range(3):
        want = nhwc(tm(nchw(x)))
        got, new_state = m.apply(
            variables, jnp.asarray(x), update_sn=True, mutable=["spectral"],
        )
        variables = {**variables, **new_state}
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-5, err_msg=f"step {step}")
    # u/v buffers themselves
    np.testing.assert_allclose(
        np.asarray(variables["spectral"]["u"]),
        tm.module.weight_u.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["spectral"]["v"]),
        tm.module.weight_v.detach().numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# painter (reference climategan/painter.py:16-171)
# ---------------------------------------------------------------------------


def _painter_opts(latent_dim=32, spade_n_up=3):
    return AddictDict({
        "gen": {"p": {
            "latent_dim": latent_dim,
            "spade_n_up": spade_n_up,
            "spade_use_spectral_norm": True,
            "spade_param_free_norm": "instance",
            "use_final_shortcut": False,
        }},
    })


def test_painter_forward_vs_reference():
    rpainter = ref("painter")
    tm = rpainter.PainterSpadeDecoder(_painter_opts()).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.normal_(0, 0.05)

    from climategan_tpu.models.painter import PainterSpadeDecoder

    m = PainterSpadeDecoder(
        latent_dim=32, spade_n_up=3, spade_use_spectral_norm=True,
        spade_param_free_norm="instance", use_final_shortcut=False,
    )
    rng = np.random.RandomState(2)
    cond = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), None, jnp.asarray(cond))
    vt = VariableTree(variables)
    sd = {f"painter.{k}": v for k, v in tm.state_dict().items()}
    convert_painter(vt, sd, flax_prefix=(), latent_dim=32, spade_n_up=3)
    variables = vt.result()

    # no_z path: z = fc(interp(cond)) (reference painter.py:149-152)
    tm.set_latent_shape((32, 32), True)
    want = nhwc(tm(None, nchw(cond)))
    got = np.asarray(m.apply(variables, None, jnp.asarray(cond)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# losses (reference climategan/losses.py)
# ---------------------------------------------------------------------------


def test_gan_loss_values_vs_reference():
    import climategan_tpu.losses as L

    rlosses = ref("losses")
    rng = np.random.RandomState(3)
    pred = rng.randn(4, 1, 7, 7).astype(np.float32)
    for use_lsgan in (True, False):
        crit = rlosses.GANLoss(use_lsgan=use_lsgan)
        for real in (True, False):
            want = float(crit(torch.from_numpy(pred), real))
            got = float(L.gan_loss(jnp.asarray(pred), real,
                                   use_lsgan=use_lsgan))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                       err_msg=f"lsgan={use_lsgan} real={real}")


def test_minent_loss_vs_reference():
    import climategan_tpu.losses as L

    rlosses = ref("losses")
    rng = np.random.RandomState(4)
    # NCHW softmax probabilities
    logits = rng.randn(2, 5, 9, 9).astype(np.float32)
    prob_t = torch.softmax(torch.from_numpy(logits), dim=1)
    prob_j = jnp.asarray(prob_t.numpy().transpose(0, 2, 3, 1))
    for version in (1, 2):
        crit = rlosses.MinentLoss(version=version, lambda_var=0.1)
        want = float(crit(prob_t))
        got = float(L.minent_loss(prob_j, version=version, lambda_var=0.1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"version={version}")


def test_sigm_loss_vs_reference():
    import climategan_tpu.losses as L

    rlosses = ref("losses")
    rng = np.random.RandomState(5)
    pred = rng.rand(2, 1, 32, 32).astype(np.float32)
    targ = rng.rand(2, 1, 32, 32).astype(np.float32)
    crit = rlosses.SIGMLoss(gmweight=0.5, device="cpu")
    want = float(crit(torch.from_numpy(pred), torch.from_numpy(targ)))
    got = float(L.sigm_loss(
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        jnp.asarray(targ.transpose(0, 2, 3, 1)), gmweight=0.5,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dada_depth_loss_vs_reference():
    import climategan_tpu.losses as L

    rlosses = ref("losses")
    rng = np.random.RandomState(6)
    pred = rng.rand(2, 1, 16, 16).astype(np.float32)
    targ = rng.rand(2, 1, 16, 16).astype(np.float32)
    crit = rlosses.DADADepthLoss()
    want = float(crit(torch.from_numpy(pred), torch.from_numpy(targ)))
    got = float(L.dada_depth_loss(
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        jnp.asarray(targ.transpose(0, 2, 3, 1)),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_prob_2_entropy_vs_reference():
    import climategan_tpu.losses as L

    rlosses = ref("losses")
    rng = np.random.RandomState(7)
    logits = rng.randn(2, 11, 8, 8).astype(np.float32)
    prob_t = torch.softmax(torch.from_numpy(logits), dim=1)
    want = rlosses.prob_2_entropy(prob_t).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(L.entropy_map(
        jnp.asarray(prob_t.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# ExtraAdam (reference climategan/optim.py:137-291)
# ---------------------------------------------------------------------------


def test_extra_adam_trajectory_vs_reference():
    from climategan_tpu.optim import extra_adam_step, init_extra_adam

    roptim = ref("optim")
    rng = np.random.RandomState(8)
    p0 = rng.randn(6, 4).astype(np.float32)
    target = rng.randn(6, 4).astype(np.float32)
    lr, b1 = 1e-2, 0.9

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = roptim.ExtraAdam([tp], lr=lr, betas=(b1, 0.999))
    tt = torch.from_numpy(target)

    params = {"w": jnp.asarray(p0)}
    state = init_extra_adam(params)

    for step in range(8):
        opt.zero_grad()
        loss = 0.5 * ((tp - tt) ** 2).sum()
        loss.backward()
        if step % 2 == 0:
            opt.extrapolation()
        else:
            opt.step()

        g = {"w": params["w"] - jnp.asarray(target)}
        params, state = extra_adam_step(
            g, state, params, lr=lr,
            extrapolate=jnp.asarray(step % 2 == 0), b1=b1,
        )
        np.testing.assert_allclose(
            np.asarray(params["w"]), tp.detach().numpy(),
            rtol=1e-5, atol=1e-6, err_msg=f"step {step}",
        )


# ---------------------------------------------------------------------------
# pretrained backbone loading (reference deeplab/__init__.py:43-101,
# deeplab_v3.py:193-230, mobilenet_v3.py:303-324) — VERDICT round-1 item 2
# ---------------------------------------------------------------------------


def _bn_jitter(model):
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.3)


def test_pretrained_resnet_backbone_knob(tmp_path):
    """Save a reference-format DeepLabv3+ (resnet) checkpoint, load it
    through gen.deeplabv3.use_pretrained, and match the reference ResNet101
    encoder forward."""
    from climategan_tpu.models.resnet import ResNetEncoder
    from climategan_tpu.utils.convert import maybe_load_pretrained_backbone
    from climategan_tpu.utils.testing import tiny_opts

    rresnet = ref("deeplab.resnet101_v3")
    tm = rresnet.ResNet101(
        output_stride=8, BatchNorm=torch.nn.BatchNorm2d, no_init=True,
    ).eval()
    _bn_jitter(tm)

    sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
    path = tmp_path / "deeplabv3_resnet.pth"
    torch.save(sd, str(path))

    opts = tiny_opts(image_size=64)
    opts.gen.encoder.architecture = "deeplabv3"
    opts.gen.deeplabv3["use_pretrained"] = True
    opts.gen.deeplabv3["pretrained_model"] = {"resnet": str(path),
                                              "mobilenet": ""}
    opts.tasks = ["m"]  # encoder only (no seg head keys in this ckpt)

    enc = ResNetEncoder(layers=(3, 4, 23, 3), output_stride=8)
    x = np.random.RandomState(9).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # the converter addresses the encoder as a generator submodule
    wrapped = {col: {"encoder": tree} for col, tree in variables.items()}
    wrapped, loaded = maybe_load_pretrained_backbone(opts, wrapped)
    assert loaded
    variables = {col: tree["encoder"] for col, tree in wrapped.items()}

    zh_j, zl_j = enc.apply(variables, jnp.asarray(x))
    zh_t, zl_t = tm(nchw(x))
    np.testing.assert_allclose(np.asarray(zl_j), nhwc(zl_t),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(zh_j), nhwc(zh_t),
                               rtol=2e-3, atol=2e-3)


def test_pretrained_mobilenet_backbone_knob(tmp_path):
    """Same through the mobilenet path (reference mobilenet_v3.py:303-324
    lenient key intersection)."""
    from climategan_tpu.models.mobilenet import MobileNetV2Encoder
    from climategan_tpu.utils.convert import maybe_load_pretrained_backbone
    from climategan_tpu.utils.testing import tiny_opts

    rmb = ref("deeplab.mobilenet_v3")
    tm = rmb.MobileNetV2(no_init=True).eval()
    _bn_jitter(tm)

    sd = dict(tm.state_dict())
    sd["classifier.weight"] = torch.zeros(2, 2)  # ignored key (lenient path)
    path = tmp_path / "deeplabv3_mobilenet.pth"
    torch.save(sd, str(path))

    opts = tiny_opts(image_size=64)
    opts.gen.encoder.architecture = "deeplabv3"
    opts.gen.deeplabv3["backbone"] = "mobilenet"
    opts.gen.deeplabv3["use_pretrained"] = True
    opts.gen.deeplabv3["pretrained_model"] = {"resnet": "",
                                              "mobilenet": str(path)}
    opts.tasks = ["m"]

    enc = MobileNetV2Encoder()
    x = np.random.RandomState(10).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    wrapped = {col: {"encoder": tree} for col, tree in variables.items()}
    wrapped, loaded = maybe_load_pretrained_backbone(opts, wrapped)
    assert loaded
    variables = {col: tree["encoder"] for col, tree in wrapped.items()}

    c4_j, c1_j = enc.apply(variables, jnp.asarray(x))
    c4_t, c1_t = tm(nchw(x))
    np.testing.assert_allclose(np.asarray(c1_j), nhwc(c1_t),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(c4_j), nhwc(c4_t),
                               rtol=2e-3, atol=2e-3)
