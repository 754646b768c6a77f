"""Figure-script ports (reference figures/*: ablation_comparison,
bootstrap_ablation_summary, labels, metrics_onefig) run end-to-end on
synthetic inputs and write their artifacts."""
import json

import numpy as np
import pandas as pd
import pytest


def _ablation_csv(tmp_path, n_img=12, seed=0):
    """Synthetic ablation CSV in the reference schema: two model pairs
    differing only in `depth`, plus a ground baseline."""
    rs = np.random.RandomState(seed)
    rows = []
    variants = [
        # model_feats, flags(masker seg depth dada_seg dada_masker spade
        # pseudo ground instagan), effect
        ("m", (1, 0, 0, 0, 0, 0, 0, 0, 0), 0.0),
        ("md", (1, 0, 1, 0, 0, 0, 0, 0, 0), -0.05),
        ("ms", (1, 1, 0, 0, 0, 0, 0, 0, 0), -0.02),
        ("msd", (1, 1, 1, 0, 0, 0, 0, 0, 0), -0.07),
        ("ground", (0, 0, 0, 0, 0, 0, 0, 1, 0), 0.1),
    ]
    flags = ("masker", "seg", "depth", "dada_seg", "dada_masker", "spade",
             "pseudo", "ground", "instagan")
    for feats, fl, effect in variants:
        for i in range(n_img):
            base = rs.uniform(0.1, 0.3)
            row = {"model_feats": feats, "img_idx": i,
                   "error": base + effect + rs.normal(0, 0.01),
                   "f05": 0.8 - effect + rs.normal(0, 0.01),
                   "edge_coherence": 0.05 + effect / 5 + rs.normal(0, 0.002)}
            row.update(dict(zip(flags, fl)))
            rows.append(row)
    csv = tmp_path / "ablation.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


def test_ablation_comparison(tmp_path):
    from scripts.ablation_comparison import main

    csv = _ablation_csv(tmp_path)
    out = tmp_path / "figs"
    assert main(["--input_csv", str(csv), "--output_dir", str(out),
                 "--n_bs", "500"]) == 0
    assert (out / "ablation_comparison_all.png").exists()
    res = json.loads((out / "ablation_comparison_all.json").read_text())
    # msd (with depth+seg) must have lower median error than plain m
    assert res["error"]["msd"]["median"] < res["error"]["m"]["median"]
    assert res["error"]["m"]["ci_left"] < res["error"]["m"]["median"] \
        < res["error"]["m"]["ci_right"]


def test_bootstrap_ablation_summary(tmp_path):
    from scripts.bootstrap_ablation_summary import main

    csv = _ablation_csv(tmp_path)
    out = tmp_path / "figs"
    assert main(["--input_csv", str(csv), "--output_dir", str(out),
                 "--n_bs", "500"]) == 0
    assert (out / "bootstrap_ablation_summary.png").exists()
    res = json.loads(
        (out / "bootstrap_ablation_summary.json").read_text())
    # depth pairs exist (m vs md, ms vs msd): effect on error ~ -0.05
    eff = res["error"]["depth"]
    assert eff["ci_left"] <= eff["20_trimmed_mean"] <= eff["ci_right"]
    assert eff["20_trimmed_mean"] < -0.02


def test_plot_labels(tmp_path):
    import cv2

    from scripts.plot_labels import main

    rs = np.random.RandomState(1)
    imgs, labels = tmp_path / "imgs", tmp_path / "labels"
    imgs.mkdir(), labels.mkdir()
    for i in range(3):
        cv2.imwrite(str(imgs / f"t_{i}.png"),
                    rs.randint(0, 255, (48, 64, 3), np.uint8))
        cv2.imwrite(str(labels / f"t_{i}.png"),
                    rs.randint(0, 3, (48, 64), np.uint8))
    out = tmp_path / "figs"
    assert main(["--images_dir", str(imgs), "--labels_dir", str(labels),
                 "--output_dir", str(out)]) == 0
    assert (out / "labels.png").exists()


def test_metrics_onefig(tmp_path):
    import cv2

    from scripts.plot_metrics import metrics_onefig

    rs = np.random.RandomState(2)
    imgs, labels, maps = (tmp_path / d for d in ("imgs", "labels", "maps"))
    for d in (imgs, labels, maps):
        d.mkdir()
    per_image = []
    for i in range(4):
        name = f"v_{i}.png"
        cv2.imwrite(str(imgs / name),
                    rs.randint(0, 255, (48, 64, 3), np.uint8))
        cv2.imwrite(str(labels / name),
                    rs.randint(0, 3, (48, 64), np.uint8))
        for mname in ("pred", "fp", "fn"):
            cv2.imwrite(str(maps / f"v_{i}_{mname}.png"),
                        rs.randint(0, 255, (48, 64), np.uint8))
        per_image.append({"image": name, "error": rs.uniform(0, 0.3),
                          "f05": rs.uniform(0.5, 1),
                          "edge_coherence": rs.uniform(0, 0.1)})
    report = tmp_path / "report.json"
    report.write_text(json.dumps({"summary": {}, "per_image": per_image}))
    out = metrics_onefig(report, imgs, labels, maps,
                         tmp_path / "figs" / "onefig.png")
    assert out.exists()
