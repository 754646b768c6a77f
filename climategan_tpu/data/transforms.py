"""Host-side dict-of-arrays transforms (numpy, NHWC).

Re-design of reference climategan/transforms.py. The device never sees any
of this: transforms run on the host (numpy / native cv2 decode) and feed
static-shape NHWC batches to the jitted steps.

Per-task interpolation parity (reference transforms.py:22-26): d/m/s use
nearest, x uses bilinear align_corners=True — both implemented with the
same exact-torch interpolation matrices as the on-device resizes.
"""
from __future__ import annotations

import random
from typing import Dict, Optional

import numpy as np

from climategan_tpu.ops.interpolate import _axis_matrix

Arrays = Dict[str, np.ndarray]  # {task: (1, H, W, C) float32}


def np_resize(arr: np.ndarray, size, mode: str, align_corners: bool = False):
    """Resize (N,H,W,C) numpy array with torch-exact semantics."""
    H, W = arr.shape[1], arr.shape[2]
    h, w = int(size[0]), int(size[1])
    if (H, W) == (h, w):
        return arr
    out = arr.astype(np.float32)
    if h != H:
        A = _axis_matrix(H, h, mode, align_corners)
        out = np.einsum("hH,NHWC->NhWC", A, out)
    if w != W:
        B = _axis_matrix(W, w, mode, align_corners)
        out = np.einsum("wW,NHWC->NHwC", B, out)
    return out


def _interp_kind(task: str):
    if task in ("d", "m", "s"):
        return "nearest", False
    return "bilinear", True


class Resize:
    """reference transforms.py:29-147."""

    def __init__(self, target_size, keep_aspect_ratio: bool = False):
        self.sizes = {}
        if isinstance(target_size, dict):
            assert not keep_aspect_ratio
            self.sizes = {
                k: (int(v), int(v)) for k, v in target_size.items()
                if k != "default"
            }
            self.default = (int(target_size["default"]),) * 2
        elif isinstance(target_size, int):
            self.default = (target_size, target_size)
        else:
            self.default = (int(target_size[0]), int(target_size[1]))
        self.keep_aspect_ratio = keep_aspect_ratio

    def __call__(self, data: Arrays) -> Arrays:
        ref = data.get("x", next(iter(data.values())))
        if self.keep_aspect_ratio:
            h, w = ref.shape[1], ref.shape[2]
            if h < w:
                new = (self.default[0], int(self.default[0] * w / h))
            else:
                new = (int(self.default[0] * h / w), self.default[1])
            sizes = {t: new for t in data}
        else:
            sizes = {t: self.sizes.get(t, self.default) for t in data}
        out = {}
        for task, arr in data.items():
            mode, ac = _interp_kind(task)
            if task == "s" and arr.dtype != np.float32:
                out[task] = np_resize(
                    arr.astype(np.float32), sizes[task], "nearest"
                ).astype(arr.dtype)
            else:
                out[task] = np_resize(arr, sizes[task], mode, ac)
        return out


class RandomCrop:
    """reference transforms.py:150-178."""

    def __init__(self, size, center: bool = False, rng: Optional[random.Random] = None):
        self.h, self.w = (size, size) if isinstance(size, int) else size
        self.center = center
        self.rng = rng or random

    def __call__(self, data: Arrays) -> Arrays:
        ref = data.get("x", next(iter(data.values())))
        H, W = ref.shape[1], ref.shape[2]
        if self.center:
            top, left = (H - self.h) // 2, (W - self.w) // 2
        else:
            top = self.rng.randint(0, max(H - self.h - 1, 0)) if H > self.h else 0
            left = self.rng.randint(0, max(W - self.w - 1, 0)) if W > self.w else 0
        return {
            t: a[:, top: top + self.h, left: left + self.w, :]
            for t, a in data.items()
        }


class RandomHorizontalFlip:
    """reference transforms.py:181-189."""

    def __init__(self, p: float = 0.5, rng=None):
        self.p = p
        self.rng = rng or random

    def __call__(self, data: Arrays) -> Arrays:
        # (quirk preserved: reference flips when rand() <= p is False,
        # i.e. flips with probability p via `if rand > p: return`)
        if self.rng.random() > self.p:
            return data
        return {t: a[:, :, ::-1, :].copy() for t, a in data.items()}


def _pin_range(x: np.ndarray) -> np.ndarray:
    # dummy pixels to preserve range under later min-max scaling
    # (reference transforms.py:504-507)
    x[:, 0, 0, :] = 1.0
    x[:, -1, -1, :] = 0.0
    return x


def _blend(a: np.ndarray, b, factor: float) -> np.ndarray:
    return np.clip(factor * a + (1.0 - factor) * b, 0.0, 1.0)


class RandBrightness:
    """torchvision adjust_brightness with U(0.5,1.5) factor on [0,1] x."""

    def __init__(self, rng=None):
        self.rng = rng or random

    def __call__(self, data: Arrays) -> Arrays:
        f = self.rng.uniform(0.5, 1.5)
        return {
            t: _pin_range(_blend(a, 0.0, f)) if t == "x" else a
            for t, a in data.items()
        }


class RandSaturation:
    def __init__(self, rng=None):
        self.rng = rng or random

    def __call__(self, data: Arrays) -> Arrays:
        f = self.rng.uniform(0.5, 1.5)
        out = {}
        for t, a in data.items():
            if t == "x":
                gray = (0.2989 * a[..., 0] + 0.587 * a[..., 1]
                        + 0.114 * a[..., 2])[..., None]
                out[t] = _pin_range(_blend(a, gray, f))
            else:
                out[t] = a
        return out


class RandContrast:
    def __init__(self, rng=None):
        self.rng = rng or random

    def __call__(self, data: Arrays) -> Arrays:
        f = self.rng.uniform(0.5, 1.5)
        out = {}
        for t, a in data.items():
            if t == "x":
                gray = 0.2989 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
                out[t] = _pin_range(_blend(a, float(gray.mean()), f))
            else:
                out[t] = a
        return out


class Normalize:
    """x: [0,1] -> normalized; s: squeeze to int labels
    (reference transforms.py:213-239)."""

    def __init__(self, normalization: str = "default"):
        if normalization == "HRNet":
            self.mean = np.array([0.485, 0.456, 0.406], np.float32)
            self.std = np.array([0.229, 0.224, 0.225], np.float32)
        else:
            self.mean = np.array([0.5, 0.5, 0.5], np.float32)
            self.std = np.array([0.5, 0.5, 0.5], np.float32)

    def __call__(self, data: Arrays) -> Arrays:
        out = {}
        for t, a in data.items():
            if t == "x":
                out[t] = (a - self.mean) / self.std
            elif t == "s":
                out[t] = a
            else:
                out[t] = a
        return out


class BucketizeDepth:
    """Log-depth bucketization for the classification head
    (reference transforms.py:264-289)."""

    def __init__(self, opts, domain: str):
        self.enabled = bool(
            opts.gen.d.get("classify", {}).get("enable")
        ) and domain in {"s", "kitti"}
        if self.enabled:
            lin = opts.gen.d.classify.linspace
            self.buckets = np.linspace(
                lin["min"], lin["max"], int(lin["buckets"]) - 1
            )

    def __call__(self, data: Arrays) -> Arrays:
        if not self.enabled or "d" not in data:
            return data
        out = dict(data)
        out["d"] = np.searchsorted(
            self.buckets, data["d"], side="right"
        ).astype(np.int32)
        return out


class PrepareInference:
    """Path/array -> model-ready (1,H,W,3) in [-1,1]
    (reference transforms.py:292-360): resize keeping aspect ratio so the
    smallest side == target, center-crop target^2, scale to [-1,1]."""

    def __init__(self, target_size: int = 640, half: bool = False):
        self.target_size = target_size
        self.half = half

    def __call__(self, x):
        import numpy as np

        if isinstance(x, (str,)) or hasattr(x, "__fspath__"):
            import cv2

            arr = cv2.imread(str(x), cv2.IMREAD_COLOR)[..., ::-1]
        else:
            arr = np.asarray(x)
        if arr.ndim == 3 and arr.shape[-1] == 4:
            arr = arr[..., :3]
        arr = arr.astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0

        h, w = arr.shape[:2]
        t = self.target_size
        if h < w:
            nh, nw = t, int(round(w * t / h))
        else:
            nh, nw = int(round(h * t / w)), t
        arr = np_resize(arr[None], (nh, nw), "bilinear", False)[0]
        top, left = (nh - t) // 2, (nw - t) // 2
        arr = arr[top: top + t, left: left + t]
        arr = arr * 2.0 - 1.0
        out = arr[None]
        if self.half:
            out = out.astype(np.float16)
        return out


class PrepareTest(PrepareInference):
    """Batch variant (reference transforms.py:363-421)."""

    def __call__(self, xs):
        import numpy as np

        return np.concatenate(
            [PrepareInference.__call__(self, x) for x in xs], axis=0
        )


def get_transforms(opts, mode: str, domain: str, rng=None):
    """Build the transform pipeline from opts.data.transforms
    (reference transforms.py:424-490)."""
    jitter_names = {"brightness", "saturation", "contrast"}
    jitter_cls = {
        "brightness": RandBrightness,
        "saturation": RandSaturation,
        "contrast": RandContrast,
    }
    transforms = []
    for t in opts.data.get("transforms", []) or []:
        ignore = t.get("ignore", False)
        if ignore is True or ignore == mode:
            continue
        name = t["name"]
        if name in jitter_names:
            continue  # appended after, train-only, painterless models only
        if name == "crop":
            transforms.append(RandomCrop(
                (int(t["height"]), int(t["width"])),
                center=t.get("center") == mode, rng=rng,
            ))
        elif name == "resize":
            transforms.append(Resize(
                t["new_size"], t.get("keep_aspect_ratio", False)
            ))
        elif name == "hflip":
            transforms.append(RandomHorizontalFlip(
                p=float(t.get("p", 0.5)), rng=rng
            ))
        else:
            raise ValueError(f"Unknown transform {name}")

    if "p" not in opts.tasks and mode == "train":
        for t in opts.data.get("transforms", []) or []:
            ignore = t.get("ignore", False)
            if ignore is True or ignore == mode:
                continue
            if t["name"] in jitter_names:
                transforms.append(jitter_cls[t["name"]](rng=rng))

    transforms.append(Normalize(opts.data.get("normalization", "default")))
    transforms.append(BucketizeDepth(opts, domain))
    return transforms


def apply_transforms(data: Arrays, transforms) -> Arrays:
    for t in transforms:
        data = t(data)
    return data
