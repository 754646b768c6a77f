"""Import the ACTUAL reference modules from /root/reference for parity tests.

The env lacks a few packages the reference imports at module level
(torch_optimizer, skimage, comet_ml, kornia, addict, torchvision). Only the
*import names* are stubbed here; any stubbed symbol raises if executed, so
a parity test can never silently compare against a stub.

Exception — faithful functional reimplementations: the wildfire event
(reference climategan/fire.py:68-127) calls four small third-party image
ops at runtime. To run the *real* reference fire/infer_all code we provide
real implementations pinned to the versions the reference declares
(torchvision 0.8.2 `_functional_tensor`, kornia 0.4 `filters`):
  - torchvision.transforms.functional.adjust_{brightness,contrast}
    (uint8 blend-with-clamp-and-truncate semantics)
  - kornia.filters.kernels.get_gaussian_kernel2d (normalized outer product)
  - kornia.filters.filter2d (depthwise cross-correlation, reflect pad)
These are marked `__faithful__ = True`; everything else still raises.
"""
from __future__ import annotations

import importlib
import json
import sys
import types
from pathlib import Path

REF_PATH = "/root/reference"


class _StubCallable:
    """Placeholder for a symbol the reference imports but we never run."""

    def __init__(self, *a, **k):
        raise RuntimeError(
            "stubbed reference dependency was called inside a parity test"
        )

    def __call__(self, *a, **k):  # pragma: no cover
        raise RuntimeError(
            "stubbed reference dependency was called inside a parity test"
        )


class AddictDict(dict):
    """Minimal addict.Dict: attribute access over nested dicts (enough for
    reference model constructors). Reading a missing key returns an empty
    (falsy) AddictDict like real addict — the reference's load_opts depends
    on this (e.g. `opts.train.kitti.pretrained`, a key that never exists —
    utils.py:159). The child is NOT stored (no write-back vivification)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            self[k] = self._hook(v)

    @classmethod
    def _hook(cls, v):
        """Recursive conversion incl. dicts inside lists (like addict)."""
        if isinstance(v, dict) and not isinstance(v, cls):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._hook(item) for item in v)
        return v

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        try:
            return self[k]
        except KeyError:
            return AddictDict()

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):
        v = super().get(k, default)
        if isinstance(v, dict) and not isinstance(v, AddictDict):
            v = AddictDict(v)
        return v


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    if "." in name:
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, m)
    return m


_installed = False


# ---------------------------------------------------------------------------
# Faithful third-party functional ops (see module docstring). Provenance:
# torchvision 0.8.2 torchvision/transforms/_functional_tensor.py
# (rgb_to_grayscale, _blend, adjust_brightness, adjust_contrast) and
# kornia 0.4 kornia/filters/{kernels,filter}.py (gaussian, filter2d).
# ---------------------------------------------------------------------------


def _tv_rgb_to_grayscale(img):
    """torchvision 0.8.2: weighted sum cast back to input dtype (uint8
    truncates)."""
    return (
        0.2989 * img[..., 0, :, :]
        + 0.587 * img[..., 1, :, :]
        + 0.114 * img[..., 2, :, :]
    ).to(img.dtype)


def _tv_blend(img1, img2, ratio):
    import torch

    bound = 255.0 if img1.dtype == torch.uint8 else 1.0
    return (
        (ratio * img1.to(torch.float32) + (1.0 - ratio) * img2)
        .clamp(0, bound)
        .to(img1.dtype)
    )


def tv_adjust_brightness(img, brightness_factor):
    import torch

    return _tv_blend(img, torch.zeros_like(img, dtype=torch.float32),
                     brightness_factor)


def tv_adjust_contrast(img, contrast_factor):
    import torch

    mean = torch.mean(_tv_rgb_to_grayscale(img).to(torch.float32))
    return _tv_blend(img, mean, contrast_factor)


def kornia_gaussian_1d(window_size, sigma):
    import torch

    x = torch.arange(window_size, dtype=torch.float32) - window_size // 2
    if window_size % 2 == 0:
        x = x + 0.5
    gauss = torch.exp(-(x ** 2) / (2.0 * float(sigma) ** 2))
    return gauss / gauss.sum()


def kornia_get_gaussian_kernel2d(kernel_size, sigma):
    ky = kornia_gaussian_1d(kernel_size[0], sigma[0])
    kx = kornia_gaussian_1d(kernel_size[1], sigma[1])
    return ky.unsqueeze(-1) @ kx.unsqueeze(-1).t()


def kornia_filter2d(input, kernel, border_type="reflect", normalized=False):
    """Depthwise cross-correlation with reflect padding (kornia 0.4)."""
    import torch
    import torch.nn.functional as F

    b, c, h, w = input.shape
    k = kernel.to(input.device, torch.float32)
    if k.dim() == 2:
        k = k[None]
    if normalized:
        k = k / k.sum(dim=(-2, -1), keepdim=True)
    kh, kw = k.shape[-2:]
    pad = [kw // 2, kw // 2, kh // 2, kh // 2]
    inp = F.pad(input.to(torch.float32), pad, mode=border_type)
    weight = k.expand(c, -1, -1).unsqueeze(1)  # (C,1,kh,kw)
    return F.conv2d(inp, weight, groups=c)


for _f in (tv_adjust_brightness, tv_adjust_contrast,
           kornia_get_gaussian_kernel2d, kornia_filter2d):
    _f.__faithful__ = True


def install_stubs():
    global _installed
    if _installed:
        return
    if REF_PATH not in sys.path:
        # APPEND, never prepend: /root/reference has top-level modules
        # (apply_events.py, train.py, ...) that would shadow this repo's
        # same-named entry points for every later test in the session
        sys.path.append(REF_PATH)
    _stub_module("torch_optimizer", NovoGrad=_StubCallable,
                 RAdam=_StubCallable)
    _stub_module("skimage")
    _stub_module("skimage.io", imread=_StubCallable, imsave=_StubCallable,
                 imshow=_StubCallable)
    _stub_module("skimage.color", rgba2rgb=_StubCallable)
    _stub_module("skimage.transform", resize=_StubCallable)
    _stub_module("skimage.filters", sobel=_StubCallable)
    _stub_module("comet_ml", Experiment=_StubCallable,
                 ExistingExperiment=_StubCallable)
    k = _stub_module("kornia")
    _stub_module("kornia.filters", filter2d=kornia_filter2d,
                 filter2D=kornia_filter2d)
    _stub_module("kornia.filters.kernels",
                 get_gaussian_kernel2d=kornia_get_gaussian_kernel2d)
    k.filters = sys.modules["kornia.filters"]
    k.filters.kernels = sys.modules["kornia.filters.kernels"]
    _stub_module("addict", Dict=AddictDict)
    # climategan/__init__.py imports every module in the package, so the
    # torchvision surface touched at import time (fid.py class bases,
    # losses.py vgg19) must all resolve
    tv = _stub_module("torchvision", __version__="0.8.2")
    tvm = _stub_module("torchvision.models", vgg19=_StubCallable,
                       inception_v3=_StubCallable)
    _stub_module(
        "torchvision.models.inception",
        InceptionA=type("InceptionA", (), {}),
        InceptionC=type("InceptionC", (), {}),
        InceptionE=type("InceptionE", (), {}),
        InceptionAux=type("InceptionAux", (), {}),
    )
    _stub_module("torchvision.models.utils",
                 load_state_dict_from_url=_StubCallable)
    _stub_module("torchvision.transforms", ToTensor=_StubCallable,
                 Compose=_StubCallable, Normalize=_StubCallable,
                 Resize=_StubCallable)
    _stub_module("torchvision.transforms.functional",
                 adjust_brightness=tv_adjust_brightness,
                 adjust_contrast=tv_adjust_contrast,
                 adjust_saturation=_StubCallable,
                 adjust_hue=_StubCallable)
    _stub_module("torchvision.utils", save_image=_StubCallable,
                 make_grid=_StubCallable)
    tv.models = tvm
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.utils = sys.modules["torchvision.utils"]
    tvm.inception = sys.modules["torchvision.models.inception"]
    tvm.utils = sys.modules["torchvision.models.utils"]
    sys.modules["torchvision.transforms"].functional = (
        sys.modules["torchvision.transforms.functional"]
    )
    _installed = True


def ref(modname: str):
    """Import and return ``climategan.<modname>`` from /root/reference."""
    install_stubs()
    return importlib.import_module(f"climategan.{modname}")


def load_ref_opts(tmp_dir, overrides: dict | None = None):
    """Load the reference's REAL option tree (shared/trainer/defaults.yaml +
    events.yaml via climategan.utils.load_opts — reference utils.py:108-208).

    `set_data_paths` asserts every data JSON exists (utils.py:211-234), so
    dummy list files are materialized under ``tmp_dir`` first.
    """
    install_stubs()
    from climategan.utils import load_opts  # noqa: E402

    jsons = Path(tmp_dir) / "jsons"
    jsons.mkdir(parents=True, exist_ok=True)
    for name in ("train_r_full.json", "train_s_fixedholes.json",
                 "train_rf.json", "train_kitti.json", "val_r_full.json",
                 "val_s_fixedholes.json", "val_rf_labelbox.json",
                 "val_kitti.json"):
        p = jsons / name
        if not p.exists():
            p.write_text(json.dumps([]))

    cmdline = {
        "output_path": str(Path(tmp_dir) / "out"),
        "data": {"files": {"base": str(jsons)}},
        # no pretrained .pth files exist offline; random init is the point
        "gen": {"deeplabv3": {"use_pretrained": False}},
        "train": {"resume": False},
    }
    if overrides:
        from climategan.utils import merge

        cmdline = merge(overrides, cmdline)
    return load_opts(commandline_opts=cmdline)


def build_ref_trainer(tmp_dir, overrides: dict | None = None):
    """Instantiate the REAL reference Trainer on CPU in inference mode with
    randomly-initialized weights (reference trainer.py:702-742 setup path).

    Returns the set-up Trainer; ``trainer.G`` is the full reference
    OmniGenerator (ResNet-101 encoder, DADA depth, DeepLabV3+ seg, mask
    decoder, SPADE painter).
    """
    import torch

    opts = load_ref_opts(tmp_dir, overrides)
    from climategan.trainer import Trainer

    if not torch.cuda.is_available():
        # The reference Timer (utils.py:919-959) creates torch.cuda.Events
        # unconditionally by default; fall back to its own perf_counter path
        # on CPU-only builds so infer_all's stage stores work.
        from climategan import utils as _rutils

        _orig_init = getattr(_rutils.Timer.__init__, "__wrapped_orig__",
                             _rutils.Timer.__init__)

        def _cpu_init(self, name="", store=None, precision=3, ignore=False,
                      cuda=False):
            _orig_init(self, name, store, precision, ignore, False)

        _cpu_init.__wrapped_orig__ = _orig_init
        _rutils.Timer.__init__ = _cpu_init

    trainer = Trainer(opts, device=torch.device("cpu"))
    trainer.setup(inference=True)
    return trainer
