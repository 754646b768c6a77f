"""Fast unit tests: serving-path checkpoint resolution and the bench
backend-probe machinery (no model build, no XLA compile)."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from climategan_tpu.utils.serving import (
    find_torch_ckpt,
    resolve_checkpoint,
    run_dir_of,
)


def test_resolve_orbax_run_dir(tmp_path):
    (tmp_path / "checkpoints").mkdir()
    (tmp_path / "checkpoints" / "latest.json").write_text("{}")
    kind, p = resolve_checkpoint(tmp_path)
    assert kind == "orbax" and p == tmp_path
    # pointing at the checkpoints dir itself resolves to the run dir
    kind, p = resolve_checkpoint(tmp_path / "checkpoints")
    assert kind == "orbax" and p == tmp_path
    assert run_dir_of(kind, p) == tmp_path


def test_resolve_torch_flavors(tmp_path):
    # bare .pth file
    f = tmp_path / "model.pth"
    f.write_bytes(b"x")
    assert resolve_checkpoint(f) == ("torch", f)
    assert run_dir_of("torch", f) == tmp_path

    # reference-style run dir: checkpoints/latest_ckpt.pth wins over
    # other .pth files (reference trainer.py:440-527)
    run = tmp_path / "run"
    (run / "checkpoints").mkdir(parents=True)
    other = run / "checkpoints" / "epoch_5_ckpt.pth"
    other.write_bytes(b"x")
    assert find_torch_ckpt(run) == other  # newest *.pth fallback
    latest = run / "checkpoints" / "latest_ckpt.pth"
    latest.write_bytes(b"x")
    kind, p = resolve_checkpoint(run)
    assert (kind, p) == ("torch", latest)
    assert run_dir_of(kind, p) == run


def test_resolve_missing_raises_with_flavors(tmp_path):
    with pytest.raises(FileNotFoundError) as ei:
        resolve_checkpoint(tmp_path / "nope")
    msg = str(ei.value)
    assert "orbax" in msg and ".pth" in msg

    notckpt = tmp_path / "file.txt"
    notckpt.write_text("x")
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint(notckpt)


def test_orbax_beats_stray_pth(tmp_path):
    """A run dir with BOTH an orbax latest.json and stray .pth files is
    this framework's own output — orbax wins."""
    (tmp_path / "checkpoints").mkdir()
    (tmp_path / "checkpoints" / "latest.json").write_text("{}")
    (tmp_path / "checkpoints" / "latest_ckpt.pth").write_bytes(b"x")
    assert resolve_checkpoint(tmp_path)[0] == "orbax"


# ---------------------------------------------------------------------------
# bench.py resilience machinery (round-4: a backend hang must produce ONE
# structured JSON line, not a dead process)
# ---------------------------------------------------------------------------


def test_bench_probe_failure_emits_structured_json():
    """Run bench.py with an env whose jax import HANGS (simulated via a
    poisoned sitecustomize on PYTHONPATH): the parent must emit the
    structured tpu_backend_unavailable JSON line and exit 0."""
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        # a fake `jax` that blocks forever on import — the probe child
        # must be killed by the parent's timeout
        (Path(d) / "jax.py").write_text("import time\ntime.sleep(3600)\n")
        env = dict(os.environ)
        env["PYTHONPATH"] = d
        env.pop("_CLIMATEGAN_BENCH_CHILD", None)
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).parent.parent / "bench.py"),
             "--probe_timeout", "3", "--probe_retries", "1"],
            capture_output=True, text=True, timeout=120, env=env,
        )
    assert proc.returncode == 0, proc.stderr[-500:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["error"] == "tpu_backend_unavailable"
    assert out["unit"] == "images/sec/chip"
    assert "value" in out and "vs_baseline" in out


def test_bench_probe_ok_path():
    """With a working (CPU) backend the probe succeeds quickly."""
    import os

    import bench

    env_backup = dict(os.environ)
    try:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        failure = bench.probe_backend(timeout_s=110, retries=1)
    finally:
        os.environ.clear()
        os.environ.update(env_backup)
    assert failure == ""


def test_explicit_load_path_missing_raises(tmp_path):
    """An explicitly-set load_paths entry that resolves to nothing must
    raise at setup (reference asserts path.exists(), trainer.py:450-513)
    — never silently serve random weights."""
    from climategan_tpu.trainer import Trainer
    from climategan_tpu.utils.testing import tiny_opts

    opts = tiny_opts(image_size=64)
    opts.output_path = str(tmp_path)
    opts.load_paths = {"pm": str(tmp_path / "does_not_exist"),
                       "p": "none", "m": "none"}
    with pytest.raises(FileNotFoundError):
        Trainer(opts).setup(inference=True)

    # no load_paths + fresh output dir: soft (random weights allowed,
    # apply_events warns at the CLI layer)
    opts.load_paths = {"pm": "none", "p": "none", "m": "none"}
    tr = Trainer(opts).setup(inference=True)
    assert tr.inference_variables is None
