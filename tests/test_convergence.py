"""Proof that training LEARNS, not just steps (round-4, VERDICT r3 item 5).

A learnable synthetic dataset of geometric street scenes — sky gradient
above a per-image horizon, textured ground below, ground == flood region —
is written to disk, trained through the REAL product path
(``Trainer.setup()`` + ``run_epoch()``), and the result is held to a
quality bar on held-out val images:

  * masker: F0.5 / error / mIOU via the paper's own metrics
    (``eval_metrics.masker_classification_metrics``; thresholds relaxed
    from the reference's f05>=0.95 / error<=0.05 bar, eval_masker.py:54-68,
    because this runs minutes not GPU-days);
  * painter: masked reconstruction error on a fixed batch drops
    substantially over training (reference painter losses,
    trainer.py:1256-1387).

The scenes are deliberately easy (color + position separable) so a tiny
encoder must solve them if gradients, losses, optimizers, BN/spectral
state threading and the data pipeline are all wired correctly — a failure
here is a real regression, not noise.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climategan_tpu.utils.testing import tiny_opts

SIZE = 64


def _scene(rs: np.random.RandomState):
    """One synthetic scene: (x uint8 HWC, m {0,1} HW, s HW class ids)."""
    h = int(SIZE * rs.uniform(0.35, 0.65))
    y = np.arange(SIZE, dtype=np.float32)[:, None]
    img = np.zeros((SIZE, SIZE, 3), np.float32)
    # sky: blue-ish vertical gradient
    sky_top = np.array([rs.uniform(90, 130), rs.uniform(140, 180),
                        rs.uniform(200, 240)])
    sky_bot = sky_top * rs.uniform(0.75, 0.95)
    t = np.clip(y / max(h, 1), 0, 1)
    sky = sky_top * (1 - t) + sky_bot * t
    img[:] = sky[:, None, :]
    # ground: brown/green texture
    ground = np.array([rs.uniform(90, 130), rs.uniform(70, 110),
                       rs.uniform(30, 60)])
    img[h:] = ground + rs.normal(0, 12, (SIZE - h, SIZE, 3))
    img[:h] += rs.normal(0, 4, (h, SIZE, 3))
    x = np.clip(img, 0, 255).astype(np.uint8)

    m = np.zeros((SIZE, SIZE), np.uint8)
    m[h:] = 1
    s = np.full((SIZE, SIZE), 9, np.uint8)  # sky class (fire.py sky == 9)
    s[h:] = 4  # ground class
    return x, m, s


def _write_scenes(root: Path, domain: str, n: int, seed: int,
                  with_labels: bool):
    import cv2

    rs = np.random.RandomState(seed)
    d = root / domain
    d.mkdir(parents=True, exist_ok=True)
    samples = []
    for i in range(n):
        x, m, s = _scene(rs)
        xp = d / f"x_{i}.png"
        cv2.imwrite(str(xp), x[..., ::-1])
        entry = {"x": str(xp)}
        mp = d / f"m_{i}.png"
        cv2.imwrite(str(mp), m * 255)
        entry["m"] = str(mp)
        if with_labels:
            sp = d / f"s_{i}.npy"
            np.save(sp, s)
            entry["s"] = str(sp)
        samples.append(entry)
    return samples


def _opts_for(root: Path, out: Path, tasks, n_train: int):
    opts = tiny_opts(image_size=SIZE, tasks=tasks)
    lists = {"train": {}, "val": {}}
    domains = ("rf",) if tasks == ("p",) else ("r", "s")
    for mode, seed0 in (("train", 0), ("val", 1000)):
        for di, domain in enumerate(domains):
            n = n_train if mode == "train" else 4
            samples = _write_scenes(root, f"{mode}_{domain}", n,
                                    seed=seed0 + di * 17,
                                    with_labels=(domain == "s"))
            lp = root / f"{mode}_{domain}.json"
            lp.write_text(json.dumps(samples))
            lists[mode][domain] = str(lp)
    opts.data.files = {"base": "", "train": lists["train"],
                       "val": lists["val"]}
    opts.data.loaders = {"batch_size": 4, "num_workers": 0}
    opts.data.transforms = [
        {"name": "resize", "ignore": False, "new_size": SIZE},
    ]
    opts.train.lambdas.G.p.vgg = 0  # no pretrained VGG offline
    # the production schedule (5e-5 halved every 5 epochs,
    # defaults.yaml:33-40) is sized for GPU-days of training; at this
    # test's ~minutes horizon it would freeze the model before it learns
    # (ExtraAdam also only steps every other iteration). Constant, larger
    # LR for the short horizon.
    opts.gen.opt.lr = {"default": 3e-4}
    opts.gen.opt.lr_gamma = 1.0
    opts.dis.opt.lr_gamma = 1.0
    opts.output_path = str(out)
    return opts


@pytest.mark.slow
def test_masker_learns_geometric_flood(tmp_path):
    """Full masker config (m task + ADVENT off for a pure supervised
    signal) trained a few hundred steps must segment held-out scenes:
    the quality bar the reference defines via eval_masker metrics."""
    from climategan_tpu.eval_metrics import (
        mIOU,
        masker_classification_metrics,
    )
    from climategan_tpu.trainer import Trainer

    opts = _opts_for(tmp_path / "data", tmp_path / "run",
                     tasks=("m",), n_train=16)
    opts.gen.m.use_advent = False
    opts.gen.m.use_minent = False
    opts.gen.s.use_dada = False

    tr = Trainer(opts)
    tr.setup()
    n_epochs = 45  # 16 samples / batch 4 = 4 steps/epoch -> 180 steps
    # (diagnostic trajectory: f05 0.978 / mIOU 0.964 at epoch 50 with
    # this config; 45 epochs leaves margin above the 0.85/0.70 bars)
    for epoch in range(n_epochs):
        tr.current_epoch = epoch
        tr.run_epoch()

    # held-out val: masker predictions vs ground truth flood masks
    g_vars = {"params": tr.state.g_params, **tr.state.g_state}
    f05s, errors, mious = [], [], []
    for item in tr.loaders["val"]["r"]:
        x = jnp.asarray(item["data"]["x"])
        m_pred = np.asarray(
            tr.G.apply(g_vars, x, method="mask"))[..., 0]
        m_true = np.asarray(item["data"]["m"])[..., 0]
        for i in range(m_pred.shape[0]):
            metrics, _ = masker_classification_metrics(
                m_pred[i], m_true[i].astype(np.int64))
            f05s.append(metrics["f05"])
            errors.append(metrics["error"])
            mious.append(mIOU((m_pred[i] > 0.5).astype(np.int64),
                              m_true[i].astype(np.int64)))
    f05, error, miou = map(float, map(np.mean, (f05s, errors, mious)))
    print(f"masker convergence: f05={f05:.3f} error={error:.3f} "
          f"mIOU={miou:.3f} over {len(f05s)} val images")
    assert f05 > 0.85, f"masker failed to learn: f05={f05:.3f}"
    assert error < 0.15, f"masker failed to learn: error={error:.3f}"
    assert miou > 0.70, f"masker failed to learn: mIOU={miou:.3f}"


@pytest.mark.slow
def test_painter_reconstruction_improves(tmp_path):
    """Painter-only training with reconstruction supervision: masked
    reconstruction error on a FIXED held-out batch must drop materially
    from early training to the end (reference get_painter_loss
    trainer.py:1256-1387)."""
    from climategan_tpu.trainer import Trainer

    opts = _opts_for(tmp_path / "data", tmp_path / "run",
                     tasks=("p",), n_train=8)
    # give the painter a supervised signal (defaults train GAN-only)
    opts.train.lambdas.G.p.reconstruction = 1
    opts.train.lambdas.G.p.context = 1

    tr = Trainer(opts)
    tr.setup()

    val_item = next(iter(tr.loaders["val"]["rf"]))
    xv = jnp.asarray(val_item["data"]["x"])
    mv = jnp.asarray(val_item["data"]["m"])

    def masked_recon():
        g_vars = {"params": tr.state.g_params, **tr.state.g_state}
        painted = tr.G.apply(g_vars, mv, xv, method="paint")
        return float(jnp.abs((painted - xv) * mv).sum()
                     / jnp.clip(mv.sum() * 3, 1e-6))

    recons = [masked_recon()]  # random-init error
    for epoch in range(20):  # 8 samples / batch 4 = 2 steps/epoch
        tr.current_epoch = epoch
        tr.run_epoch()
        recons.append(masked_recon())
    print("painter masked-recon trajectory:",
          [round(r, 4) for r in recons])
    early = float(np.mean(recons[:3]))
    late = float(np.mean(recons[-3:]))
    assert np.isfinite(late)
    assert late < 0.70 * early, (
        f"painter reconstruction did not improve: early={early:.4f} "
        f"late={late:.4f} trajectory={recons}"
    )
