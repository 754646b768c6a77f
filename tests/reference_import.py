"""Import the ACTUAL reference modules from /root/reference for parity tests.

The env lacks a few packages the reference imports at module level
(torch_optimizer, skimage, comet_ml, kornia, addict, torchvision). Only the
*import names* are stubbed here; any stubbed symbol raises if executed, so
a parity test can never silently compare against a stub.
"""
from __future__ import annotations

import importlib
import sys
import types

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
    reference model constructors; no auto-vivification on read of missing)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            if isinstance(v, dict) and not isinstance(v, AddictDict):
                self[k] = AddictDict(v)

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

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


def install_stubs():
    global _installed
    if _installed:
        return
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
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
    _stub_module("kornia.filters", filter2d=_StubCallable,
                 filter2D=_StubCallable)
    k.filters = sys.modules["kornia.filters"]
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
                 adjust_brightness=_StubCallable,
                 adjust_contrast=_StubCallable,
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
