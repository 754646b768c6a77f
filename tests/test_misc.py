"""Misc coverage: opts system, launcher expansion, timer, summary,
paint_and_mask resolution modes."""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from climategan_tpu.utils.opts import (
    Opts,
    flatten_opts,
    load_opts,
    merge,
    parse_overrides,
)


def test_opts_merge_and_overrides():
    opts = load_opts(commandline_opts=["gen.p.latent_dim=32",
                                       "tasks=[m,p]",
                                       "train.epochs=7"])
    assert opts.gen.p.latent_dim == 32
    assert opts.tasks == ["m", "p"]
    assert opts.train.epochs == 7
    # derived domains: m -> r,s ; p -> rf (reference utils.py:164-172)
    assert opts.domains == ["r", "s", "rf"]
    # events auto-attached
    assert opts.events.fire.kernel_size == 281
    # addict-style missing key access
    assert not opts.nonexistent.deeply.nested


def test_flatten_opts():
    flat = flatten_opts(Opts({"a": {"b": 1, "c": [1, 2]}, "d": "x"}))
    assert flat == {"a.b": 1, "a.c": [1, 2], "d": "x"}


def test_parse_overrides_yaml_values():
    o = parse_overrides(["a.b=0.5", "c=true", "d=[1,2]", "e=text"])
    assert o.a.b == 0.5 and o.c is True and o.d == [1, 2] and o.e == "text"


def test_launcher_expansion():
    import launch

    exp = {
        "runs": 3,
        "searches": {
            "gen.opt.lr.default": {"sample": "list", "from": [1e-4, 5e-5]},
            "train.epochs": {"sample": "sequential", "from": [5, 10, 15]},
        },
        "base_overrides": {"tasks": "[m]"},
    }
    cfgs = launch.expand(exp, seed=0)
    assert len(cfgs) == 3
    assert [c["train.epochs"] for c in cfgs] == [5, 10, 15]
    assert all(c["tasks"] == "[m]" for c in cfgs)

    cart = launch.expand({
        "cartesian": True,
        "searches": {
            "a": {"sample": "list", "from": [1, 2]},
            "b": {"sample": "list", "from": [3, 4]},
        },
    })
    assert len(cart) == 4


def test_launcher_scripts_and_slurm_headers(tmp_path):
    """Script emission with #SBATCH headers + background submission
    (reference sbatch.py script generation + submission)."""
    import subprocess
    import sys
    import time

    import yaml

    stub = tmp_path / "fake_train.py"
    stub.write_text("import sys; print('hello_bg', sys.argv[1:])\n")
    exp = {
        "runs": 2,
        "script": str(stub),
        "searches": {"train.epochs": {"sample": "sequential",
                                      "from": [1, 2]}},
        "slurm": {"job_name": "cg_{i}", "partition": "tpu",
                  "time": "01:00:00", "mem": "16G"},
    }
    yml = tmp_path / "exp.yaml"
    yml.write_text(yaml.safe_dump(exp))
    scripts = tmp_path / "scripts"
    out = subprocess.run(
        [sys.executable, "launch.py", "-e", str(yml),
         "--scripts_dir", str(scripts)],
        capture_output=True, text=True, cwd=str(Path(__file__).parent.parent),
    )
    assert out.returncode == 0, out.stderr
    shs = sorted(scripts.glob("run_*.sh"))
    assert len(shs) == 2
    text = shs[0].read_text()
    assert "#SBATCH --job-name=cg_0" in text
    assert "#SBATCH --partition=tpu" in text
    assert "train.epochs=1" in text

    # background submission runs the scripts and writes pid + log files
    out = subprocess.run(
        [sys.executable, "launch.py", "-e", str(yml),
         "--scripts_dir", str(scripts), "--submit", "background"],
        capture_output=True, text=True, cwd=str(Path(__file__).parent.parent),
    )
    assert out.returncode == 0, out.stderr
    for _ in range(50):
        if (scripts / "run_000.log").exists():
            break
        time.sleep(0.1)
    assert (scripts / "run_000.pid").exists()


def test_timer_and_report():
    from climategan_tpu.utils.timer import Timer, stores_report

    stores = {"stage": []}
    with Timer(store=stores["stage"]):
        pass
    assert len(stores["stage"]) == 1
    rep = stores_report(stores)
    assert "stage" in rep


def test_param_summary():
    from climategan_tpu.utils.summary import count_params, param_summary

    params = {"a": {"w": np.zeros((2, 3))}, "b": {"w": np.zeros(5)}}
    assert count_params(params) == 11
    s = param_summary(params)
    assert "total params: 11" in s


def test_paint_and_mask_modes():
    from climategan_tpu.trainer import Trainer
    from climategan_tpu.utils.testing import tiny_opts

    opts = tiny_opts(image_size=64)
    t = Trainer(opts)
    t.G = None
    # minimal state bootstrap without loaders: reuse builder init
    from climategan_tpu.train_step import StepBuilder
    from tests.test_train_step import _batch

    t.builder = StepBuilder(opts)
    t.state = t.builder.init_state(jax.random.PRNGKey(0), _batch())
    t.G = t.builder.G
    t.is_setup = True

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 70, 90, 3),
                           minval=-1, maxval=1)
    # painter has 5 upsamples in tiny config -> multiple of 32
    approx = t.paint_and_mask(x, resolution="approx")
    assert approx.shape[1] % 32 == 0 and approx.shape[2] % 32 == 0
    exact = t.paint_and_mask(x, resolution="exact")
    assert exact.shape == (1, 70, 90, 3)


def test_apply_events_helpers():
    from apply_events import to_128, resize_and_crop, uint8_to_m11

    # reference semantics: floor to multiple of 128 (utils.py:998-1007)
    assert to_128(700) == 640 and to_128(630) == 512 and to_128(100) == 128
    assert to_128(1500, max_width=1280) == 1280

    img = (np.random.RandomState(0).rand(97, 145, 3) * 255).astype(np.uint8)
    out = resize_and_crop(img, 64)
    assert out.shape == (64, 64, 3)
    m11 = uint8_to_m11(out)
    assert -1.0 <= m11.min() and m11.max() <= 1.0


def test_perlin_noise_statistics():
    from climategan_tpu.ops.perlin import mix_noise, rand_perlin_2d

    key = jax.random.PRNGKey(0)
    noise = np.asarray(rand_perlin_2d(key, (64, 64), (8, 8)))
    assert noise.shape == (64, 64)
    # perlin is zero-mean-ish and bounded by ~sqrt(2)/2 * sqrt(2)
    assert abs(noise.mean()) < 0.2
    assert np.abs(noise).max() <= 1.5

    x = jnp.zeros((1, 64, 64, 3))
    mask = jnp.ones((1, 64, 64))
    y = np.asarray(mix_noise(key, x, mask, res=(8, 8), weight=1.0))
    # with weight 1 and full mask, output == min-shifted noise (>= 0)
    assert y.min() >= 0.0 and y.std() > 0.01


def test_opts_copy_and_to_dict():
    from climategan_tpu.utils.opts import Opts

    o = Opts({"a": {"b": [1, {"c": 2}]}})
    d = o.to_dict()
    assert isinstance(d["a"], dict) and d["a"]["b"][1]["c"] == 2
    o2 = o.copy()
    o2.a.b = 5
    assert o.a.b != 5  # deep copy


def test_snconv_grouped():
    from climategan_tpu.models.norms import SNConv

    x = jnp.ones((1, 8, 8, 8))
    m = SNConv(8, (3, 3), padding=(1, 1), groups=8)  # depthwise
    v = m.init(jax.random.PRNGKey(0), x)
    assert v["params"]["kernel"].shape == (3, 3, 1, 8)
    y = m.apply(v, x)
    assert y.shape == (1, 8, 8, 8)


def test_upsample_nearest_factors():
    from climategan_tpu.ops.interpolate import upsample_nearest

    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 2, 3, 1)
    y = np.asarray(upsample_nearest(x, 3, 2))
    assert y.shape == (1, 6, 6, 1)
    assert (y[0, :3, :2, 0] == 0).all()  # top-left block replicated


def test_kitti_pretrain_loader_switch():
    """Epoch loader switching for kitti pretraining (reference switch_data,
    trainer.py:817-846: pretrain epochs read kitti instead of sim)."""
    from climategan_tpu.trainer import Trainer

    t = Trainer.__new__(Trainer)  # loaders-only unit check, no setup
    t.loaders = {"train": {"r": 1, "s": 2, "rf": 3, "kitti": 4}}
    t.kitti_pretrain = True
    assert t._epoch_loaders() == {"kitti": 4}
    t.kitti_pretrain = False
    assert set(t._epoch_loaders()) == {"r", "s", "rf"}


def test_checkpoint_structure_mismatch_raises(tmp_path):
    """Resuming into a drifted model structure must fail loudly with the
    offending paths, not silently reassign leaves positionally."""
    import pytest

    from climategan_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    class FakeOpts(dict):
        def __getattr__(self, k):
            return self[k]

    state = {"g_params": {"a": np.zeros(3), "b": np.ones(2)}}
    save_checkpoint(tmp_path, state, epoch=0)

    ok, epoch = restore_checkpoint(tmp_path, state)
    assert epoch == 0 and np.allclose(ok["g_params"]["b"], 1.0)

    drifted = {"g_params": {"a": np.zeros(3), "b": np.ones(2),
                            "new_module": np.zeros(4)}}
    with pytest.raises(ValueError, match="structure mismatch"):
        restore_checkpoint(tmp_path, drifted)


def test_pretrained_backbone_missing_file_raises():
    import pytest

    from climategan_tpu.utils.convert import maybe_load_pretrained_backbone
    from climategan_tpu.utils.testing import tiny_opts

    opts = tiny_opts(image_size=64)
    opts.gen.encoder.architecture = "deeplabv3"
    opts.gen.deeplabv3["use_pretrained"] = True
    opts.gen.deeplabv3["pretrained_model"] = {"resnet": "/nope/missing.pth",
                                              "mobilenet": ""}
    with pytest.raises(FileNotFoundError):
        maybe_load_pretrained_backbone(opts, {"params": {}})

    # knob off -> no-op
    opts.gen.deeplabv3["use_pretrained"] = False
    _, loaded = maybe_load_pretrained_backbone(opts, {"params": {}})
    assert not loaded


def test_train_cli_comet_lifecycle_offline(tmp_path):
    """setup_comet (reference train.py:108-172 analog) must be a safe no-op
    offline and record/recover experiment ids through the run dir when a
    comet module is importable (faked here)."""
    import sys
    import types

    from climategan_tpu.utils.opts import load_opts

    import train as train_cli

    opts = load_opts()
    opts.output_path = str(tmp_path)
    opts.comet = {"use": False}
    assert train_cli.setup_comet(opts, resuming=False) is None

    class FakeExp:
        def __init__(self, **kw):
            self.id = "exp123"
            self.url = "http://comet/exp123"
            self.assets = []
            self.params = {}
            self.tags = []

        def log_asset_folder(self, p, **kw):
            self.assets.append(p)

        def log_asset(self, p):
            self.assets.append(p)

        def add_tags(self, tags):
            self.tags += tags

        def log_parameters(self, d):
            self.params.update(d)

    class FakeExisting(FakeExp):
        def __init__(self, previous_experiment=None, **kw):
            super().__init__()
            self.id = previous_experiment

    fake = types.ModuleType("comet_ml")
    fake.Experiment = FakeExp
    fake.ExistingExperiment = FakeExisting
    old = sys.modules.get("comet_ml")
    sys.modules["comet_ml"] = fake
    try:
        opts.comet = {"use": True, "tags": ["t1"]}
        exp = train_cli.setup_comet(opts, resuming=False)
        assert exp is not None and exp.assets  # sources uploaded
        assert "t1" in exp.tags and exp.params
        assert (tmp_path / "comet_id.txt").read_text() == "exp123"
        # resume path recovers the recorded id
        exp2 = train_cli.setup_comet(opts, resuming=True)
        assert exp2.id == "exp123"
    finally:
        if old is not None:
            sys.modules["comet_ml"] = old
        else:
            del sys.modules["comet_ml"]


def test_apply_events_transfer_flatten_roundtrip():
    """flatten_events/unflatten_events (the fast device->host transfer
    layout) must round-trip every written event exactly and drop
    non-image outputs like the mask."""
    import jax.numpy as jnp
    import numpy as np

    from apply_events import flatten_events, unflatten_events

    rng = np.random.RandomState(0)
    out = {
        "flood": jnp.asarray(rng.randint(0, 256, (2, 8, 6, 3), np.uint8)),
        "wildfire": jnp.asarray(rng.randint(0, 256, (2, 8, 6, 3), np.uint8)),
        "smog": jnp.asarray(rng.randint(0, 256, (2, 8, 6, 3), np.uint8)),
        "mask": jnp.asarray(rng.rand(2, 8, 6, 1).astype(np.float32)),
    }
    flat = flatten_events(out)
    assert set(flat) == {"flood", "wildfire", "smog"}
    assert all(v.shape == (2, 8, 18) for v in flat.values())
    back = unflatten_events(flat)
    for k in ("flood", "wildfire", "smog"):
        np.testing.assert_array_equal(back[k], np.asarray(out[k]))
