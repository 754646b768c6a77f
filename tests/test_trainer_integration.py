"""Integration: synthetic on-disk dataset -> Trainer.setup() -> train one
epoch -> evaluate -> save -> resume. The analog of the reference's
functional test harness (tests/test_trainer.py:181-196: tiny data, real
training loop)."""
import json
import os
from pathlib import Path
import jax

import numpy as np
import pytest

from climategan_tpu.utils.testing import tiny_opts

SIZE = 64


def _write_dataset(root: Path, n: int = 4):
    import cv2

    rng = np.random.RandomState(0)
    lists = {"train": {}, "val": {}}
    for domain in ("r", "s", "rf"):
        samples = []
        for i in range(n):
            d = root / domain
            d.mkdir(parents=True, exist_ok=True)
            x = rng.randint(0, 255, (72, 96, 3), np.uint8)
            xp = d / f"x_{i}.png"
            cv2.imwrite(str(xp), x[..., ::-1])
            entry = {"x": str(xp)}

            m = (rng.rand(72, 96) > 0.5).astype(np.uint8) * 255
            mp = d / f"m_{i}.png"
            cv2.imwrite(str(mp), m)
            entry["m"] = str(mp)

            if domain == "s":
                # valid unity 3-channel depth encoding (decoded to 1/depth):
                # keep R/G in-range so decoded metric depth stays > 0
                dd = np.stack([
                    np.full((72, 96), 100, np.uint8),
                    np.full((72, 96), 100, np.uint8),
                    rng.randint(0, 254, (72, 96)).astype(np.uint8),
                ], axis=-1)
                dp = d / f"d_{i}.npy"
                np.save(dp, dd)
                entry["d"] = str(dp)
                s = rng.randint(0, 11, (72, 96)).astype(np.uint8)
                sp = d / f"s_{i}.npy"
                np.save(sp, s)
                entry["s"] = str(sp)
            samples.append(entry)
        for mode in ("train", "val"):
            lp = root / f"{mode}_{domain}.json"
            with open(lp, "w") as f:
                json.dump(samples, f)
            lists[mode][domain] = str(lp)
    return lists


@pytest.fixture(scope="module")
def trainer_opts(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    lists = _write_dataset(root)
    opts = tiny_opts(image_size=SIZE)
    feat = max(SIZE // 4, 32)
    opts.data.files = {"base": "", "train": lists["train"],
                       "val": lists["val"]}
    opts.data.loaders = {"batch_size": 2, "num_workers": 0}
    opts.data.max_samples = 4
    # transforms sized for the tiny config
    opts.data.transforms = [
        {"name": "hflip", "ignore": "val", "p": 0.5},
        {"name": "resize", "ignore": False, "new_size": SIZE + 8,
         "keep_aspect_ratio": True},
        {"name": "crop", "ignore": False, "center": "val",
         "height": SIZE, "width": SIZE},
        {"name": "resize", "ignore": False,
         "new_size": {"default": SIZE, "d": feat, "s": feat}},
    ]
    opts.train.epochs = 1
    opts.train.lambdas.G.p.vgg = 0  # no pretrained VGG in test env
    opts.output_path = str(tmp_path_factory.mktemp("run"))
    # unity s-domain depth decoding expects 3-channel; our synthetic d is
    # already scalar — treat the s domain depth as megadepth-style
    return opts


def test_loaders(trainer_opts):
    from climategan_tpu.data.datasets import get_all_loaders

    # patch: synthetic sim depth is scalar (megadepth-style); force r rules
    loaders = get_all_loaders(trainer_opts)
    assert set(loaders["train"].keys()) == {"r", "s", "rf"}
    batch = next(iter(loaders["train"]["s"]))
    data = batch["data"]
    assert data["x"].shape == (2, SIZE, SIZE, 3)
    assert data["x"].min() >= -1.0 and data["x"].max() <= 1.0
    feat = max(SIZE // 4, 32)
    assert data["s"].shape == (2, feat, feat)
    assert data["d"].shape == (2, feat, feat, 1)
    assert data["m"].shape == (2, SIZE, SIZE, 1)
    assert set(np.unique(data["m"])) <= {0.0, 1.0}


def test_trainer_epoch_save_resume(trainer_opts):
    from climategan_tpu.trainer import Trainer

    trainer = Trainer(trainer_opts)
    trainer.setup()
    trainer.run_epoch()
    assert trainer.global_step == 2  # 4 samples, batch 2, drop_last

    metrics = trainer.run_evaluation()
    assert any(k.startswith("val/") for k in metrics)

    trainer.save()
    ckpt_dir = Path(str(trainer_opts.output_path)) / "checkpoints"
    assert (ckpt_dir / "latest.json").exists()

    trainer2 = Trainer(trainer_opts)
    trainer2.setup()
    assert trainer2.resume()
    assert int(trainer2.state.step) == 2


def test_partial_checkpoint_load(trainer_opts):
    """load_paths.m / .p partial restores (reference trainer.py:422-579)."""
    import jax.numpy as jnp
    from climategan_tpu.trainer import Trainer
    from climategan_tpu.utils.checkpoint import load_partial_state

    src = Trainer(trainer_opts)
    src.setup()
    ckpt_dir = Path(str(trainer_opts.output_path)) / "checkpoints"
    # the previous test saved a checkpoint at this path

    dst = Trainer(trainer_opts)
    dst.setup(rng_seed=123)  # different init
    before = np.asarray(
        jax.tree_util.tree_leaves(dst.state.g_params["painter"])[0]
    ).copy()
    new = load_partial_state(ckpt_dir, dst.state, parts=("painter",))
    assert new is not None
    after = np.asarray(
        jax.tree_util.tree_leaves(new.g_params["painter"])[0]
    )
    assert not np.allclose(before, after)  # painter replaced
    # masker untouched
    enc_before = jax.tree_util.tree_leaves(dst.state.g_params["encoder"])[0]
    enc_after = jax.tree_util.tree_leaves(new.g_params["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(enc_before),
                                  np.asarray(enc_after))


def test_trainer_hybrid_spatial_shards(trainer_opts):
    """tpu.spatial_shards=2 trains on a hybrid dp x sp2 mesh through the
    production Trainer path (SERVING.md scale-out; numerics pinned by
    test_mesh_equivalence's hybrid test). One epoch must run with finite
    losses on the 2-D mesh."""
    import copy

    from climategan_tpu.trainer import Trainer

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")

    opts = copy.deepcopy(trainer_opts)
    opts.tpu.spatial_shards = 2
    opts.output_path = str(Path(str(trainer_opts.output_path)) / "hybrid")
    trainer = Trainer(opts)
    trainer.setup()
    assert trainer.mesh.axis_names == ("data", "space")
    assert trainer.mesh.devices.shape == (2, 2)  # batch 2 -> dp2 x sp2
    trainer.run_epoch()
    assert trainer.global_step == 2
