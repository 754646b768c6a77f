"""Round-3 behavior-gap regression tests (VERDICT r2 item 4):

  * pseudo-label losses switch off after train.pseudo.epochs
    (reference trainer.py:920-922)
  * infer_all rebuilds its fused graph when knobs change
    (bin_value/cloudy/ignore_event select different XLA graphs)
  * validation losses average over the FULL zipped val loaders
    (reference trainer.py:1653-1704)
  * FID fake painting runs in bounded batches (reference fid.py:366-373
    paints per val batch, never all 57 images in one graph)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climategan_tpu.train_step import StepBuilder
from climategan_tpu.utils.testing import tiny_opts

from tests.test_train_step import _batch


# ---------------------------------------------------------------------------
# pseudo epoch gating
# ---------------------------------------------------------------------------


def test_pseudo_scale_schedule():
    from climategan_tpu.trainer import Trainer

    opts = tiny_opts(image_size=64)
    opts.train.pseudo = {"tasks": ["d", "s"], "epochs": 3}
    tr = Trainer(opts)
    assert tr.pseudo_scale(0) == 1.0
    assert tr.pseudo_scale(2) == 1.0
    assert tr.pseudo_scale(3) == 0.0  # reference clears at epoch n-1's end
    assert tr.pseudo_scale(10) == 0.0

    opts.train.pseudo = {"tasks": ["d"], "epochs": -1}  # never disable
    assert Trainer(opts).pseudo_scale(500) == 1.0

    # epochs == 0 also never disables: the reference's clear condition
    # `epoch == epochs - 1` (trainer.py:920-922) never fires for epochs=0
    opts.train.pseudo = {"tasks": ["d"], "epochs": 0}
    assert Trainer(opts).pseudo_scale(0) == 1.0
    assert Trainer(opts).pseudo_scale(500) == 1.0

    opts.train.pseudo = {"tasks": [], "epochs": 3}  # nothing to gate
    assert Trainer(opts).pseudo_scale(0) == 0.0


def test_random_vgg_is_disabled_with_warning(capsys):
    """The reference always builds VGG19 from pretrained torchvision
    weights (losses.py:304-350); with no weights file here, the perceptual
    loss must be DISABLED with a loud warning rather than silently trained
    against a random VGG — unless train.allow_random_vgg opts in."""
    from climategan_tpu.trainer import Trainer

    opts = tiny_opts(image_size=64)
    assert float(opts.train.lambdas.G.p.vgg) != 0  # flagship loss is on
    tr = Trainer(opts)
    rng = jax.random.PRNGKey(0)
    assert tr._maybe_vgg(rng) is None
    outerr = capsys.readouterr()
    assert "DISABLING" in outerr.out and "vgg_weights" in outerr.out

    opts.train.allow_random_vgg = True
    tr = Trainer(opts)
    assert tr._maybe_vgg(rng) is not None  # explicit opt-in: random VGG
    assert "RANDOM VGG" in capsys.readouterr().out


def test_pseudo_losses_gated_by_traced_scale():
    """With pseudo tasks on, the real-domain d/s supervision terms must be
    exactly zeroed by pseudo_scale=0.0 while the sim-domain terms and all
    other losses are untouched — same compiled graph, traced switch."""
    opts = tiny_opts(image_size=64)
    opts.train.pseudo = {"tasks": ["d", "s"], "epochs": 1}
    builder = StepBuilder(opts, vgg_variables=None)
    rng = jax.random.PRNGKey(0)
    batch = _batch()
    # give the real domain pseudo labels (same shapes as sim)
    batch["r"]["d"] = batch["s"]["d"].copy()
    batch["r"]["s"] = batch["s"]["s"].copy()
    state = builder.init_state(rng, batch)

    step = jax.jit(builder.train_step)
    _, m_on = step(state, batch, 1.0, 1.0, 1.0)
    _, m_off = step(state, batch, 1.0, 1.0, 0.0)

    # pseudo terms: nonzero with scale 1, exactly 0 with scale 0
    assert abs(float(m_on["d_r"])) > 0
    assert abs(float(m_on["s_crossent_r"])) > 0
    assert float(m_off["d_r"]) == 0.0
    assert float(m_off["s_crossent_r"]) == 0.0
    # sim-domain supervision unaffected by the gate
    np.testing.assert_allclose(float(m_on["d_s"]), float(m_off["d_s"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_on["s_crossent_s"]),
                               float(m_off["s_crossent_s"]), rtol=1e-6)


def test_val_losses_respect_pseudo_gate():
    """run_evaluation's loss pass must gate pseudo terms like the train
    step: the reference clears pseudo_training_tasks for ALL loss
    computation after train.pseudo.epochs (trainer.py:920-922), so val
    totals at pseudo_scale=0 must drop the real-domain d/s supervision."""
    opts = tiny_opts(image_size=64)
    opts.train.pseudo = {"tasks": ["d", "s"], "epochs": 1}
    builder = StepBuilder(opts, vgg_variables=None)
    rng = jax.random.PRNGKey(0)
    batch = _batch()
    batch["r"]["d"] = batch["s"]["d"].copy()
    batch["r"]["s"] = batch["s"]["s"].copy()
    state = builder.init_state(rng, batch)

    m_on = builder.eval_losses(state, batch, 1.0)
    m_off = builder.eval_losses(state, batch, 0.0)
    assert abs(float(m_on["val_d_r"])) > 0
    assert float(m_off["val_d_r"]) == 0.0
    assert float(m_off["val_s_crossent_r"]) == 0.0
    assert float(m_off["val_g_total"]) < float(m_on["val_g_total"])


# ---------------------------------------------------------------------------
# infer_all knob cache
# ---------------------------------------------------------------------------


def test_infer_all_rebuilds_on_knob_change():
    from climategan_tpu.trainer import Trainer

    opts = tiny_opts(image_size=64)
    opts.tpu["inference_dtype"] = "float32"
    tr = Trainer(opts)
    tr.setup(inference=True)
    variables = jax.jit(tr.G.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    x = np.random.RandomState(0).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    out_all = tr.infer_all(x, variables=variables, cloudy=False)
    assert {"flood", "wildfire", "smog", "mask"} <= set(out_all)

    # changing ignore_event must NOT reuse the cached all-events graph
    out_flood = tr.infer_all(x, variables=variables, cloudy=False,
                             ignore_event=("wildfire", "smog"))
    assert "wildfire" not in out_flood and "smog" not in out_flood
    assert "flood" in out_flood

    # bin_value knob: binarized vs smooth masks give different floods
    out_smooth = tr.infer_all(x, variables=variables, cloudy=False,
                              bin_value=-1,
                              ignore_event=("wildfire", "smog"))
    assert not np.array_equal(out_flood["flood"], out_smooth["flood"])
    assert len(tr._infer_fns) >= 3


# ---------------------------------------------------------------------------
# full-val-set loss averaging + batched FID painting (loader-level)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    from climategan_tpu.trainer import Trainer

    from tests.test_trainer_integration import SIZE, _write_dataset

    root = tmp_path_factory.mktemp("data")
    lists = _write_dataset(root, n=4)
    opts = tiny_opts(image_size=SIZE)
    feat = max(SIZE // 4, 32)
    opts.data.files = {"base": "", "train": lists["train"],
                       "val": lists["val"]}
    opts.data.loaders = {"batch_size": 2, "num_workers": 0}
    opts.data.max_samples = 4
    opts.data.transforms = [
        {"name": "resize", "ignore": False, "new_size": SIZE + 8,
         "keep_aspect_ratio": True},
        {"name": "crop", "ignore": False, "center": "val",
         "height": SIZE, "width": SIZE},
        {"name": "resize", "ignore": False,
         "new_size": {"default": SIZE, "d": feat, "s": feat}},
    ]
    opts.train.epochs = 1
    opts.train.lambdas.G.p.vgg = 0
    opts.output_path = str(tmp_path_factory.mktemp("run"))
    tr = Trainer(opts)
    tr.setup()
    return tr


def test_val_losses_average_over_all_batches(tiny_trainer):
    tr = tiny_trainer
    n_val_batches = min(
        len(list(ld)) for ld in tr.loaders["val"].values())
    assert n_val_batches >= 2  # the regression needs >1 batch to matter

    calls = []
    orig = tr._eval_losses if tr._eval_losses is not None \
        else tr.builder.eval_losses

    def spy(state, batch, pseudo_scale=1.0):
        calls.append(set(batch.keys()))
        return orig(state, batch, pseudo_scale)

    # run_evaluation uses the jitted _eval_losses built at setup
    tr._eval_losses = spy
    try:
        metrics = tr.run_evaluation()
    finally:
        tr._eval_losses = orig
    assert len(calls) == n_val_batches
    assert any(k.startswith("val_") for k in metrics)


def test_fid_painting_batched(tiny_trainer, monkeypatch):
    tr = tiny_trainer
    tr.opts.train.fid = {"enable": True, "n_images": 4, "batch_size": 50,
                         "paint_batch_size": 2}
    paint_batches = []
    real_G = tr.G

    class SpyG:
        """flax Modules are frozen dataclasses — proxy instead of setattr."""

        def __getattr__(self, name):
            return getattr(real_G, name)

        def apply(self, variables, *args, **kw):
            if kw.get("method") == "paint":
                paint_batches.append(int(args[0].shape[0]))
            return real_G.apply(variables, *args, **kw)

    monkeypatch.setattr(tr, "G", SpyG())
    fid = tr.compute_val_fid()
    assert np.isfinite(fid) or np.isnan(fid)  # random-init FID is relative
    assert paint_batches == [2, 2]  # 4 images painted in 2 bounded chunks
