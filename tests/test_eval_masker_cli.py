"""eval_masker CLI + figure outputs on a synthetic labeled set
(reference eval_masker.py:232-320 overlay figures, :751-772 boxplots)."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np


def _synthetic_set(root: Path, n=2, size=64):
    import cv2

    rng = np.random.RandomState(0)
    imgs = root / "imgs"
    labels = root / "labels"
    imgs.mkdir(parents=True)
    labels.mkdir(parents=True)
    for i in range(n):
        img = rng.randint(0, 255, (size, size, 3), np.uint8)
        cv2.imwrite(str(imgs / f"im_{i}.png"), img)
        # {cannot=0, must=1, may=2} label map
        lab = rng.randint(0, 3, (size, size)).astype(np.uint8)
        cv2.imwrite(str(labels / f"im_{i}.png"), lab)
    return imgs, labels


def test_plot_overlay_images(tmp_path):
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from climategan_tpu.eval_metrics import masker_classification_metrics
    from scripts.plot_metrics import plot_overlay_images

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    label = rng.randint(0, 3, (64, 64))
    pred = rng.rand(64, 64)
    metrics, maps = masker_classification_metrics(pred, label)
    out = tmp_path / "overlay.png"
    plot_overlay_images(out, img, label, pred, metrics, maps,
                        edge_coherence=0.01)
    assert out.exists() and out.stat().st_size > 0


def test_eval_masker_cli_end_to_end(tmp_path):
    """Full CLI: synthetic images+labels -> metrics JSON + maps + overlay
    figures + boxplots (random weights; asserts outputs, not quality)."""
    imgs, labels = _synthetic_set(tmp_path)
    out = tmp_path / "report" / "metrics.json"
    out.parent.mkdir()
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "HOME": "/root",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache"}
    repo = Path(__file__).parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "eval_masker.py"),
         "--images_dir", str(imgs), "--labels_dir", str(labels),
         "--output", str(out), "--size", "64", "--plot", "--write_maps"],
        capture_output=True, text=True, cwd=str(repo), env=env,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(out.read_text())
    assert report["summary"]["n_images"] == 2
    for key in ("f05", "error", "edge_coherence", "mnr", "accuracy"):
        assert np.isfinite(report["summary"][key])
    plots = sorted((out.parent / "plots").glob("*.png"))
    assert any(p.name.startswith("im_") for p in plots), plots
    assert any(p.name.startswith("boxplot_") for p in plots), plots
    maps = sorted((out.parent / "maps").glob("*.png"))
    assert len(maps) >= 6
