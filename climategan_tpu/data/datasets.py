"""Datasets + loaders: JSON/YAML file lists -> prefetched NHWC numpy batches.

Re-design of reference climategan/data.py:
  * OmniListDataset (:402-503): samples are {task: path} dicts read from
    JSON/YAML lists; per-task decode in `load_task` (tensor_loader,
    :344-399) incl. megadepth (r), Unity 3-channel (s) and kitti uint16
    depth decodings (tutils.py:195-219, 237-294).
  * get_loader/get_all_loaders (:506-539): shuffled, drop-last loaders per
    {mode}x{domain}.

TPU-native runtime: decode runs through cv2's native C++ JPEG/PNG path, a
thread pool overlaps decode with device compute, and batches are stacked
into pinned numpy arrays ready for jax.device_put onto the mesh (the
framework's answer to torch's pinned-memory DataLoader workers).
"""
from __future__ import annotations

import json
import queue
import random
from pathlib import Path
from typing import Dict, Iterator, List

import numpy as np
import yaml

from climategan_tpu.data.transforms import apply_transforms, get_transforms
from climategan_tpu.utils.opts import env_expand

try:
    import cv2  # native decode path

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    from PIL import Image

    _HAS_CV2 = False

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp"}


def _imread(path: str) -> np.ndarray:
    """RGB(A) uint8/uint16 image read via cv2 (fallback PIL)."""
    if _HAS_CV2:
        arr = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if arr is None:
            raise FileNotFoundError(path)
        if arr.ndim == 3 and arr.shape[-1] >= 3:
            arr = arr[..., [2, 1, 0] + list(range(3, arr.shape[-1]))]  # BGR->RGB
        return arr
    return np.asarray(Image.open(path))


def decode_unity_depth(arr: np.ndarray, log: bool = True,
                       normalize: bool = False, far: float = 1000.0):
    """Unity 3-channel depth encoding -> metric depth
    (reference tutils.py:237-294)."""
    R = ((247.0 - arr[..., 0]) / 8.0).astype(np.int64)
    G = ((247.0 - arr[..., 1]) / 8.0).astype(np.int64)
    B = (255.0 - arr[..., 2]).astype(np.int64)
    depth = (R * 256 * 31 + G * 256 + B).astype(np.float32) / (256 * 31 * 31 - 1)
    depth = depth * far
    if not log:
        depth = 1.0 / depth
    if log:
        depth = np.log(depth)
    if normalize:
        depth = depth - depth.min()
        depth = depth / depth.max()
    return depth


def load_task(path: str, task: str, domain: str, opts) -> np.ndarray:
    """Decode one sample file -> (1, H, W, C) float32 (or int for s).

    Mirrors reference tensor_loader (data.py:344-399).
    """
    path = env_expand(path)
    suffix = Path(path).suffix.lower()

    if task == "s":
        if domain == "kitti":
            from climategan_tpu.data.palettes import process_kitti_seg

            labels = process_kitti_seg(_imread(path))
            return labels.astype(np.int32)[None, :, :, None]
        if suffix == ".npy":
            arr = np.load(path)
        elif suffix in (".pt", ".pth"):
            import torch

            arr = torch.load(path, map_location="cpu", weights_only=False)
            arr = np.asarray(arr)
        else:
            arr = _imread(path)
        arr = np.squeeze(arr)
        if arr.ndim == 3:  # one-hot or RGB-coded: keep as channels
            return arr.astype(np.float32)[None]
        return arr.astype(np.int32)[None, :, :, None]

    if task == "d":
        arr = np.load(path) if suffix == ".npy" else _imread(path)
        arr = arr.astype(np.float32)
        log_depth = bool(opts.gen.d.get("classify", {}).get("enable"))
        norm = "d" in (opts.train.get("pseudo", {}).get("tasks", []) or [])
        if domain == "r":  # megadepth: min-max normalize
            arr = arr - arr.min()
            arr = arr / max(arr.max(), 1e-12)
        elif domain == "s":
            arr = decode_unity_depth(arr, log=log_depth, normalize=norm)
        elif domain == "kitti":
            arr = arr / 100.0
            if not log_depth:
                arr = 1.0 / arr
                if norm:
                    arr = arr - arr.min()
                    arr = arr / max(arr.max(), 1e-12)
            else:
                arr = np.log(arr)
        arr = np.squeeze(arr)
        return arr.astype(np.float32)[None, :, :, None]

    if suffix == ".npy":
        arr = np.load(path).astype(np.float32)
    elif suffix in IMG_EXTENSIONS:
        arr = _imread(path).astype(np.float32)
    else:
        raise ValueError(f"Unknown data type {path}")

    if arr.ndim == 3 and arr.shape[-1] == 4:
        arr = arr[..., :3]

    if task == "x":
        arr = arr - arr.min()
        arr = arr / max(arr.max(), 1e-12)
        return arr[None]
    if task == "m":
        if arr.max() > 127:
            arr = (arr > 127).astype(np.float32)
        if arr.ndim == 3:
            arr = arr[..., 0]
        return arr.astype(np.float32)[None, :, :, None]
    return arr[None]


class OmniListDataset:
    """JSON/YAML list of {task: path} samples (reference data.py:402-503)."""

    def __init__(self, mode: str, domain: str, opts, transforms=None):
        self.opts = opts
        self.mode = mode
        self.domain = domain
        self.tasks = set(opts.tasks) | {"x"}
        if "p" in self.tasks:
            self.tasks.add("m")

        flp = Path(str(opts.data.files[mode][domain]))
        if "/" not in str(flp):
            flp = Path(str(opts.data.files.get("base", ""))) / flp
        flp = Path(env_expand(flp))
        if flp.suffix == ".json":
            with open(flp) as f:
                self.samples_paths = json.load(f)
        elif flp.suffix in (".yaml", ".yml"):
            with open(flp) as f:
                self.samples_paths = yaml.safe_load(f)
        else:
            raise ValueError(f"Unknown file list type: {flp}")

        max_samples = opts.data.get("max_samples", -1)
        if max_samples and max_samples != -1:
            self.samples_paths = self.samples_paths[: int(max_samples)]

        # keep only task keys the model needs (reference filter_samples)
        self.samples_paths = [
            {k: v for k, v in s.items() if k in self.tasks}
            for s in self.samples_paths
        ]
        self.file_list_path = str(flp)
        self.transforms = transforms

    def __len__(self):
        return len(self.samples_paths)

    def __getitem__(self, i: int) -> Dict:
        paths = self.samples_paths[i]
        data = {
            task: load_task(p, task, self.domain, self.opts)
            for task, p in paths.items()
        }
        if self.transforms:
            data = apply_transforms(data, self.transforms)
        return {
            "data": data,
            "paths": paths,
            "domain": "s" if self.domain == "kitti" else self.domain,
            "mode": self.mode,
        }


def _collate(items: List[Dict]) -> Dict:
    """Stack a list of samples into a {task: (B,...)} batch."""
    tasks = items[0]["data"].keys()
    data = {}
    for t in tasks:
        arrs = [np.asarray(it["data"][t]) for it in items]
        data[t] = np.concatenate(arrs, axis=0)
        if t == "s" and data[t].ndim == 4 and data[t].shape[-1] == 1:
            data[t] = data[t][..., 0].astype(np.int32)
    return {
        "data": data,
        "domain": items[0]["domain"],
        "mode": items[0]["mode"],
        "paths": [it["paths"] for it in items],
    }


class Loader:
    """Shuffled, drop-last, thread-prefetching batch loader."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last
        self.rng = random.Random(seed)
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        return [
            idx[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(nb)
        ]

    def __iter__(self) -> Iterator[Dict]:
        self.epoch += 1
        batches = self._index_batches()
        if self.num_workers == 0:
            for b in batches:
                yield _collate([self.dataset[i] for i in b])
            return

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.num_workers) as pool:
            # prefetch depth = num_workers batches
            futures = queue.Queue()
            it = iter(batches)

            def submit_next():
                try:
                    b = next(it)
                except StopIteration:
                    return False
                futures.put(pool.submit(
                    lambda bb: _collate([self.dataset[i] for i in bb]), b
                ))
                return True

            for _ in range(self.num_workers + 1):
                if not submit_next():
                    break
            while not futures.empty():
                f = futures.get()
                submit_next()
                yield f.result()


def get_loader(mode: str, domain: str, opts, seed: int = 0) -> Loader:
    if (domain != "kitti" or not opts.train.kitti.get("pretrain")
            or not opts.train.kitti.get("batch_size")):
        batch_size = int(opts.data.loaders.get("batch_size", 4))
    else:
        batch_size = int(opts.train.kitti.get("batch_size", 4))
    ds = OmniListDataset(
        mode, domain, opts,
        transforms=get_transforms(opts, mode, domain),
    )
    return Loader(
        ds, batch_size, shuffle=True,
        num_workers=int(opts.data.loaders.get("num_workers", 2)),
        seed=seed,
    )


def get_all_loaders(opts, seed: int = 0) -> Dict[str, Dict[str, Loader]]:
    loaders: Dict[str, Dict[str, Loader]] = {}
    for mode in ("train", "val"):
        loaders[mode] = {}
        for domain in opts.domains:
            files = opts.data.get("files", {})
            if mode in files and domain in files[mode]:
                loaders[mode][domain] = get_loader(mode, domain, opts, seed)
    return loaders
