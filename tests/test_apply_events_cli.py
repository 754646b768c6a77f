"""End-to-end apply_events CLI on a real (tiny) checkpoint.

The full serving path the reference ships (apply_events.py:454-542):
train-run dir -> opts + orbax checkpoint -> fused inference graph ->
image decode/resize -> batched infer -> device->host flattened fetch ->
event PNGs. --keep_ratio_128 keeps the 128x128 inputs at 128^2 so the
tiny model compiles quickly on CPU.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climategan_tpu.utils.testing import tiny_opts


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """A minimal training-run dir: opts.yaml + one saved checkpoint."""
    import yaml

    from climategan_tpu.trainer import Trainer

    out = tmp_path_factory.mktemp("run")
    opts = tiny_opts(image_size=64)
    opts.output_path = str(out)
    tr = Trainer(opts)
    tr.G = None  # setup() builds everything; avoid stale fields
    from climategan_tpu.models.generator import create_generator
    from climategan_tpu.train_step import StepBuilder

    from tests.test_train_step import _batch

    # init a state without loaders (save() only needs state + paths)
    tr.builder = StepBuilder(opts, vgg_variables=None)
    tr.G = create_generator(opts)
    tr.state = tr.builder.init_state(jax.random.PRNGKey(0), _batch())
    tr.save()
    with (out / "opts.yaml").open("w") as f:
        yaml.safe_dump(opts.to_dict(), f)
    assert (out / "checkpoints" / "latest.json").exists()
    return out


def test_apply_events_cli_end_to_end(run_dir, tmp_path, monkeypatch):
    import cv2

    import apply_events

    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    rs = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(str(in_dir / f"im_{i}.png"),
                    rs.randint(0, 255, (128, 128, 3), np.uint8))
    out_dir = tmp_path / "outs"

    monkeypatch.setattr(sys, "argv", [
        "apply_events.py", "-i", str(in_dir), "-o", str(out_dir),
        "-r", str(run_dir), "-b", "2", "--keep_ratio_128", "--time",
    ])
    apply_events.main()

    pngs = sorted(p.name for p in out_dir.glob("*.png"))
    assert len(pngs) == 9, pngs  # 3 images x {flood, wildfire, smog}
    for event in ("flood", "wildfire", "smog"):
        assert sum(event in p for p in pngs) == 3
    sample = cv2.imread(str(out_dir / pngs[0]))
    assert sample.shape == (128, 128, 3)
    assert sample.std() > 0  # not a constant image


def test_apply_events_cli_mesh(run_dir, tmp_path, monkeypatch):
    """--mesh: the same CLI serves data-parallel over the virtual mesh
    (SERVING.md scale-out); outputs must match the single-device run to
    1 uint8 LSB (the sharding layer cannot change the math)."""
    import cv2

    import apply_events

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")

    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    rs = np.random.RandomState(1)
    for i in range(2):
        cv2.imwrite(str(in_dir / f"im_{i}.png"),
                    rs.randint(0, 255, (128, 128, 3), np.uint8))

    out_single = tmp_path / "outs_single"
    monkeypatch.setattr(sys, "argv", [
        "apply_events.py", "-i", str(in_dir), "-o", str(out_single),
        "-r", str(run_dir), "-b", "2", "--keep_ratio_128",
    ])
    apply_events.main()

    out_mesh = tmp_path / "outs_mesh"
    monkeypatch.setattr(sys, "argv", [
        "apply_events.py", "-i", str(in_dir), "-o", str(out_mesh),
        "-r", str(run_dir), "-b", "2", "--keep_ratio_128", "--mesh",
    ])
    apply_events.main()

    names = sorted(p.name for p in out_single.glob("*.png"))
    assert names == sorted(p.name for p in out_mesh.glob("*.png"))
    assert len(names) == 6
    for n in names:
        a = cv2.imread(str(out_single / n)).astype(np.int32)
        b = cv2.imread(str(out_mesh / n)).astype(np.int32)
        assert np.abs(a - b).max() <= 1, n
