"""Bootstrap-ablation figure tooling (port of reference
figures/bootstrap_ablation.py — VERDICT r2 item 8)."""
import numpy as np
import pandas as pd

from scripts.bootstrap_ablation import (
    bootstrap,
    find_model_pairs,
    main,
    paired_diffs,
)


def _ablation_csv(path, n_imgs=40, effect=0.05, seed=0):
    """Two model pairs differing only in `depth`; depth models get a known
    +effect on f05, -effect on error."""
    rng = np.random.RandomState(seed)
    rows = []
    for mf, depth, spade in (("M-D-S", True, True), ("M-S", False, True),
                             ("M-D", True, False), ("M", False, False)):
        for i in range(n_imgs):
            base_f05 = 0.8 + 0.05 * rng.randn()
            base_err = 0.1 + 0.02 * rng.randn()
            rows.append({
                "model_feats": mf, "img_idx": i,
                "masker": True, "seg": False, "depth": depth,
                "dada_seg": False, "dada_masker": False, "spade": spade,
                "pseudo": False, "ground": False, "instagan": False,
                "f05": base_f05 + (effect if depth else 0.0),
                "error": base_err - (effect if depth else 0.0),
                "edge_coherence": 0.02 + 0.005 * rng.randn(),
            })
    pd.DataFrame(rows).to_csv(path, index=False)


def test_find_model_pairs(tmp_path):
    csv = tmp_path / "m.csv"
    _ablation_csv(csv)
    df = pd.read_csv(csv)
    pairs = find_model_pairs(df, "depth")
    assert sorted(pairs) == [("M-D", "M"), ("M-D-S", "M-S")]
    diffs = paired_diffs(df, pairs)
    assert len(diffs["f05"]) == 80  # 2 pairs x 40 images


def test_bootstrap_vectorized_statistics():
    rng = np.random.default_rng(0)
    vals = rng.normal(0.5, 0.1, 200)
    bs = bootstrap(vals, n_bs=2000, seed=1, batch=512,
                   measures=("mean", "median", "20_trimmed_mean"))
    for k in ("mean", "median", "20_trimmed_mean"):
        assert bs[k].shape == (2000,)
        assert abs(bs[k].mean() - 0.5) < 0.02


def test_main_end_to_end(tmp_path):
    csv = tmp_path / "m.csv"
    _ablation_csv(csv, effect=0.05)
    out = tmp_path / "out"
    results = main(["--input_csv", str(csv), "--technique", "depth",
                    "--output_dir", str(out), "--n_bs", "2000"])
    # known effect recovered with the right sign and a confident CI
    assert results["f05"]["ci_left"] > 0
    assert results["error"]["ci_right"] < 0
    assert abs(results["f05"]["bs_mean"] - 0.05) < 0.02
    for m in ("f05", "error", "edge_coherence"):
        assert (out / f"depth_bootstrap_{m}_20_trimmed_mean.png").exists()
    assert (out / "depth_bootstrap.json").exists()
