"""Import the reference PyTorch package (/root/reference/latentfusion) for
cross-framework equivalence tests.

The environment is missing a few of the reference's (non-numeric) deps —
structlog, toml, torchvision, skimage, plyfile — so we install minimal stub
modules before importing it. The stubs only satisfy imports (logging,
config-file parsing, morphology used outside the compared code paths); every
numerical computation under test runs the reference's real code.

Test infrastructure only; never imported by latentfusion_tpu.
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


class _NullLogger:
    def _log(self, *args, **kwargs):
        return None

    debug = info = warning = warn = error = exception = critical = _log

    def bind(self, **kwargs):
        return self


def _make_structlog():
    mod = types.ModuleType("structlog")

    class _Passthrough:
        def __init__(self, *args, **kwargs):
            pass

        def __call__(self, *args, **kwargs):
            return args[-1] if args else None

    stdlib = types.ModuleType("structlog.stdlib")
    stdlib.add_logger_name = _Passthrough()
    stdlib.add_log_level = _Passthrough()
    stdlib.PositionalArgumentsFormatter = _Passthrough
    stdlib.LoggerFactory = _Passthrough
    stdlib.BoundLogger = object

    processors = types.ModuleType("structlog.processors")
    processors.TimeStamper = _Passthrough
    processors.StackInfoRenderer = _Passthrough
    processors.format_exc_info = _Passthrough()

    dev = types.ModuleType("structlog.dev")
    dev.ConsoleRenderer = _Passthrough

    mod.stdlib = stdlib
    mod.processors = processors
    mod.dev = dev
    mod.configure = lambda **kwargs: None
    mod.get_logger = lambda *a, **k: _NullLogger()
    return {"structlog": mod, "structlog.stdlib": stdlib,
            "structlog.processors": processors, "structlog.dev": dev}


def _make_toml():
    import tomllib

    mod = types.ModuleType("toml")

    def load(f):
        if hasattr(f, "read"):
            return tomllib.loads(f.read())
        with open(f, "rb") as fh:
            return tomllib.load(fh)

    mod.load = load
    mod.loads = tomllib.loads
    return {"toml": mod}


def _make_torchvision():
    mod = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")

    def _unavailable(*args, **kwargs):
        raise RuntimeError("torchvision stub: unavailable in this env")

    models.vgg16 = _unavailable

    class _Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    transforms = types.ModuleType("torchvision.transforms")
    transforms.Lambda = _Lambda
    transforms.Compose = _unavailable
    transforms.ColorJitter = _unavailable
    functional = types.ModuleType("torchvision.transforms.functional")
    for name in ("hflip", "rotate", "perspective", "normalize", "to_tensor",
                 "to_pil_image", "resize", "crop"):
        setattr(functional, name, _unavailable)
    transforms.functional = functional
    mod.models = models
    mod.transforms = transforms
    return {"torchvision": mod, "torchvision.models": models,
            "torchvision.transforms": transforms,
            "torchvision.transforms.functional": functional}


def _make_skimage():
    import numpy as np
    from scipy import ndimage

    mod = types.ModuleType("skimage")
    morphology = types.ModuleType("skimage.morphology")

    def disk(radius):
        r = int(radius)
        yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
        return (yy * yy + xx * xx <= r * r).astype(np.uint8)

    def binary_erosion(image, selem=None, footprint=None):
        structure = selem if selem is not None else footprint
        return ndimage.binary_erosion(np.asarray(image, dtype=bool),
                                      structure=structure)

    def binary_dilation(image, selem=None, footprint=None):
        structure = selem if selem is not None else footprint
        return ndimage.binary_dilation(np.asarray(image, dtype=bool),
                                       structure=structure)

    morphology.disk = disk
    morphology.binary_erosion = binary_erosion
    morphology.binary_dilation = binary_dilation
    mod.morphology = morphology
    return {"skimage": mod, "skimage.morphology": morphology}


def _make_plyfile():
    mod = types.ModuleType("plyfile")

    class _Unavailable:
        def __init__(self, *args, **kwargs):
            raise RuntimeError("plyfile stub: PLY IO unavailable")

    mod.PlyData = _Unavailable
    mod.PlyElement = _Unavailable
    return {"plyfile": mod}


def _patch_torch_compat():
    """The reference targets the torch<=2.3 API; newer torch removed the
    ``verbose`` kwarg from ReduceLROnPlateau, which the reference's
    GradientPoseEstimator passes (estimation.py:588-594). Re-accept and
    drop it so the reference's own code runs unmodified."""
    import inspect

    import torch

    sched = torch.optim.lr_scheduler.ReduceLROnPlateau
    if "verbose" not in inspect.signature(sched.__init__).parameters:
        orig_init = sched.__init__

        def __init__(self, *args, verbose=False, **kwargs):
            orig_init(self, *args, **kwargs)

        sched.__init__ = __init__


def install_stubs():
    builders = {
        "structlog": _make_structlog,
        "toml": _make_toml,
        "torchvision": _make_torchvision,
        "skimage": _make_skimage,
        "plyfile": _make_plyfile,
    }
    _patch_torch_compat()
    for name, builder in builders.items():
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            sys.modules.update(builder())


def import_reference():
    """Install stubs and return the reference ``latentfusion`` package."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import latentfusion

    return latentfusion
