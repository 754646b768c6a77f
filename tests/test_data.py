"""Data decode + transform unit tests (reference data.py/transforms.py
semantics)."""
import numpy as np
import pytest

from climategan_tpu.data.palettes import (
    CLASSES,
    encode_exact_segmap,
    merge_labels,
    process_kitti_seg,
)
from climategan_tpu.data.transforms import (
    BucketizeDepth,
    Normalize,
    RandomCrop,
    RandomHorizontalFlip,
    Resize,
)
from climategan_tpu.utils.opts import load_opts


def test_kitti_palette_roundtrip():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 15, (16, 16))
    rgb = np.zeros((16, 16, 3), np.uint8)
    for k, v in CLASSES["kitti"].items():
        rgb[labels == k] = v
    decoded = encode_exact_segmap(rgb, CLASSES["kitti"])
    np.testing.assert_array_equal(decoded, labels)
    merged = process_kitti_seg(rgb)
    # kitti Sky (1) -> climategan Sky (9)
    assert (merged[labels == 1] == 9).all()
    # kitti Car/Truck/Van -> Car (6)
    for k in (11, 12, 13):
        assert (merged[labels == k] == 6).all()


def test_resize_per_task_sizes():
    data = {
        "x": np.random.rand(1, 32, 48, 3).astype(np.float32),
        "s": np.random.randint(0, 11, (1, 32, 48, 1)).astype(np.int32),
        "d": np.random.rand(1, 32, 48, 1).astype(np.float32),
    }
    r = Resize({"default": 24, "d": 12, "s": 12})
    out = r(data)
    assert out["x"].shape == (1, 24, 24, 3)
    assert out["s"].shape == (1, 12, 12, 1)
    assert out["s"].dtype == np.int32  # nearest keeps labels integral
    assert out["d"].shape == (1, 12, 12, 1)


def test_resize_keep_aspect_ratio():
    data = {"x": np.random.rand(1, 30, 60, 3).astype(np.float32)}
    out = Resize(20, keep_aspect_ratio=True)(data)
    assert out["x"].shape == (1, 20, 40, 3)


def test_crop_center_and_flip_consistency():
    x = np.arange(1 * 8 * 8 * 1, dtype=np.float32).reshape(1, 8, 8, 1)
    data = {"x": x, "m": x.copy()}
    out = RandomCrop(4, center=True)(data)
    assert out["x"].shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(out["x"], out["m"])  # same crop everywhere

    class AlwaysFlip:
        def random(self):
            return 0.0

    out = RandomHorizontalFlip(p=0.5, rng=AlwaysFlip())(data)
    np.testing.assert_array_equal(out["x"][:, :, ::-1, :], data["x"])


def test_normalize_default():
    x = np.random.rand(1, 4, 4, 3).astype(np.float32)
    out = Normalize("default")({"x": x})
    np.testing.assert_allclose(out["x"], (x - 0.5) / 0.5, rtol=1e-6)


def test_bucketize_depth():
    opts = load_opts(commandline_opts={
        "gen": {"d": {"classify": {
            "enable": True,
            "linspace": {"min": 0.0, "max": 1.0, "buckets": 11},
        }}},
    })
    b = BucketizeDepth(opts, "s")
    d = np.linspace(0, 1, 16, dtype=np.float32).reshape(1, 4, 4, 1)
    out = b({"d": d})
    assert out["d"].dtype == np.int32
    assert out["d"].min() >= 0 and out["d"].max() <= 10
