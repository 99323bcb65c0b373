"""Compatibility shims that let the UNMODIFIED torch reference
(/root/reference) run on this host for the accuracy-parity protocol.

The container has torch 2.13 (CPU) but lacks torchvision, torchmetrics,
and the torch-1.x quantisation-mapping aliases the reference imports.
`install()` registers minimal, faithful stand-ins BEFORE the reference
modules are imported:

  * torchvision.datasets.{MNIST,FashionMNIST,CIFAR10,SVHN} read the same
    on-disk files qbn_tpu's readers do (idx / cifar pickles / .mat) and
    yield PIL images, as real torchvision does;
  * torchvision.transforms.{Compose,ToTensor,Normalize,RandomCrop,
    RandomHorizontalFlip,RandomAffine,ColorJitter} + functional.affine
    implement the exact subset the reference uses
    (reference: src/data.py:105-259);
  * torchmetrics.CalibrationError implements the l1/10-bin multiclass
    calibration error with bucketize(right=True) binning
    (reference: src/metrics.py:381-383);
  * torch.quantization.quantization_mappings gains the legacy
    QAT_MODULE_MAPPINGS / STATIC_QUANT_MODULE_MAPPINGS names the
    reference mutates (reference: src/quant_utils.py:30-66).

No reference code is modified; nothing is written outside the chosen
scratch directory.
"""

from __future__ import annotations

import random
import sys
import types

import numpy as np
import torch


# ---------------------------------------------------------------------------
# torchvision
# ---------------------------------------------------------------------------

def _to_pil(arr: np.ndarray):
    from PIL import Image
    if arr.ndim == 3 and arr.shape[-1] == 1:
        return Image.fromarray(arr[..., 0], mode="L")
    return Image.fromarray(arr)


class _ArrayDataset(torch.utils.data.Dataset):
    """(N, H, W, C) uint8 images + int labels, yielding PIL images."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, transform):
        self.data = np.ascontiguousarray(images)
        self.targets = np.asarray(labels, np.int64)
        self.transform = transform

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        img = _to_pil(self.data[idx])
        if self.transform is not None:
            img = self.transform(img)
        return img, int(self.targets[idx])


def _load_uint8(name: str, root: str, train: bool):
    """Read the on-disk dataset via qbn_tpu's readers, back to uint8."""
    from qbn_tpu.data.datasets import load_images
    x, y = load_images(name, root, train=train)
    return np.round(x * 255.0).astype(np.uint8), y


def _make_datasets_module():
    m = types.ModuleType("torchvision.datasets")

    class MNIST(_ArrayDataset):
        def __init__(self, root, train=True, download=False,
                     transform=None):
            x, y = _load_uint8("mnist", root, train)
            super().__init__(x, y, transform)

    class FashionMNIST(_ArrayDataset):
        def __init__(self, root, train=True, download=False,
                     transform=None):
            x, y = _load_uint8("fashion_mnist", root, train)
            super().__init__(x, y, transform)

    class CIFAR10(_ArrayDataset):
        def __init__(self, root, train=True, download=False,
                     transform=None):
            x, y = _load_uint8("cifar", root, train)
            super().__init__(x, y, transform)

    class SVHN(_ArrayDataset):
        def __init__(self, root, split="test", download=False,
                     transform=None):
            x, y = _load_uint8("svhn", root, split == "train")
            super().__init__(x, y, transform)

    m.MNIST, m.FashionMNIST, m.CIFAR10, m.SVHN = (
        MNIST, FashionMNIST, CIFAR10, SVHN)
    return m


def _pil_affine(img, angle, translations, scale, shear, **kwargs):
    """Subset of torchvision.transforms.functional.affine used by the
    reference (rotation OR integer translation, scale 1, no shear)."""
    from PIL import Image
    tx, ty = translations
    if angle:
        # torchvision 0.8.2's F.affine rotates CLOCKWISE for a positive
        # angle (docs: "clockwise direction"); PIL.rotate is
        # counter-clockwise, hence the negation. Verified bitwise against
        # the reconstructed 0.8.2 inverse-affine matrix in
        # tests/test_distortion_sweep.py::test_rotate_matches_torchvision.
        img = img.rotate(-angle, resample=Image.NEAREST, fillcolor=0)
    if tx or ty:
        img = img.transform(img.size, Image.AFFINE,
                            (1, 0, -tx, 0, 1, -ty),
                            resample=Image.NEAREST, fillcolor=0)
    return img


def _make_transforms_module():
    m = types.ModuleType("torchvision.transforms")
    f = types.ModuleType("torchvision.transforms.functional")
    f.affine = _pil_affine
    m.functional = f

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, img):
            for t in self.transforms:
                img = t(img)
            return img

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.uint8)
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            return torch.from_numpy(arr.astype(np.float32) / 255.0)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32)
            self.std = torch.tensor(std, dtype=torch.float32)

        def __call__(self, t):
            return (t - self.mean[:, None, None]) / self.std[:, None, None]

    class RandomCrop:
        def __init__(self, size, padding=0):
            self.size, self.padding = size, padding

        def __call__(self, img):
            arr = np.asarray(img, np.uint8)
            p = self.padding
            pad = ((p, p), (p, p)) + (((0, 0),) if arr.ndim == 3 else ())
            arr = np.pad(arr, pad, mode="constant")
            top = random.randint(0, arr.shape[0] - self.size)
            left = random.randint(0, arr.shape[1] - self.size)
            return _to_pil(arr[top:top + self.size, left:left + self.size]
                           if arr.ndim == 2 else
                           arr[top:top + self.size,
                               left:left + self.size, :])

    class RandomHorizontalFlip:
        def __init__(self, p=0.5):
            self.p = p

        def __call__(self, img):
            from PIL import Image
            if random.random() < self.p:
                return img.transpose(Image.FLIP_LEFT_RIGHT)
            return img

    class RandomAffine:
        """Rotation-only subset (reference passes translate=scale=shear=
        None and a (lo, hi) degrees tuple, src/data.py:205-214)."""

        def __init__(self, degrees, translate=None, scale=None, shear=None,
                     **kwargs):
            if isinstance(degrees, (tuple, list)):
                self.lo, self.hi = float(degrees[0]), float(degrees[1])
            else:
                self.lo, self.hi = -float(degrees), float(degrees)

        def __call__(self, img):
            angle = random.uniform(self.lo, self.hi)
            return _pil_affine(img, angle, (0, 0), 1.0, 0)

    class ColorJitter:
        """Brightness-only subset (reference passes (b, b) tuples,
        src/utils.py:21)."""

        def __init__(self, brightness=0, **kwargs):
            if isinstance(brightness, (tuple, list)):
                self.lo, self.hi = float(brightness[0]), float(brightness[1])
            else:
                b = float(brightness)
                self.lo, self.hi = max(0.0, 1.0 - b), 1.0 + b

        def __call__(self, img):
            from PIL import ImageEnhance
            factor = random.uniform(self.lo, self.hi)
            return ImageEnhance.Brightness(img).enhance(factor)

    for name, cls in (("Compose", Compose), ("ToTensor", ToTensor),
                      ("Normalize", Normalize), ("RandomCrop", RandomCrop),
                      ("RandomHorizontalFlip", RandomHorizontalFlip),
                      ("RandomAffine", RandomAffine),
                      ("ColorJitter", ColorJitter)):
        setattr(m, name, cls)
    return m


def install_torchvision():
    tv = types.ModuleType("torchvision")
    tv.datasets = _make_datasets_module()
    tv.transforms = _make_transforms_module()
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = tv.datasets
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.transforms.functional"] = \
        tv.transforms.functional
    return tv


# ---------------------------------------------------------------------------
# torchmetrics
# ---------------------------------------------------------------------------

def install_torchmetrics():
    tm = types.ModuleType("torchmetrics")

    class Metric(torch.nn.Module):
        """Functional subset of torchmetrics.Metric: add_state with tensor
        defaults, reset() restoring them, .to() passthrough — the
        reference's streaming metrics (src/metrics.py:8-240) subclass
        this and call update()/compute() directly."""

        is_differentiable = False
        higher_is_better = None
        full_state_update = True

        def __init__(self, *args, **kwargs):
            super().__init__()
            object.__setattr__(self, "_state_defaults", {})

        def add_state(self, name, default, dist_reduce_fx=None):
            self._state_defaults[name] = (
                default.clone() if torch.is_tensor(default)
                else list(default))
            setattr(self, name,
                    default.clone() if torch.is_tensor(default)
                    else list(default))

        def reset(self):
            for k, v in self._state_defaults.items():
                setattr(self, k,
                        v.clone() if torch.is_tensor(v) else list(v))

        @property
        def device(self):
            return torch.device("cpu")

        def to(self, *a, **k):
            return self

    class CalibrationError(Metric):
        """Multiclass l1 calibration error (ECE), matching torchmetrics:
        confidence = max prob, accuracy = argmax == target, equal-width
        bins assigned by bucketize(conf, linspace(0,1,n+1), right=True)-1
        clamped to the top bin."""

        def __init__(self, n_bins=10, task="multiclass", norm="l1",
                     num_classes=None, **kwargs):
            super().__init__()
            assert norm == "l1"
            self.n_bins = n_bins
            self.reset()

        def reset(self):
            self._conf, self._acc = [], []

        def to(self, device):
            return self

        def update(self, preds, target):
            p = preds.detach().float()
            if p.dim() == 1:
                p = torch.stack([1 - p, p], dim=1)
            conf, idx = p.max(dim=1)
            self._conf.append(conf.cpu())
            self._acc.append((idx.cpu() == target.detach().cpu()).float())

        def compute(self):
            conf = torch.cat(self._conf)
            acc = torch.cat(self._acc)
            bounds = torch.linspace(0, 1, self.n_bins + 1,
                                    dtype=torch.float32)
            idx = torch.clamp(
                torch.bucketize(conf, bounds, right=True) - 1,
                0, self.n_bins - 1)
            ece = torch.zeros(())
            n = conf.numel()
            for b in range(self.n_bins):
                m = idx == b
                cnt = m.sum()
                if cnt:
                    ece = ece + (acc[m].mean()
                                 - conf[m].mean()).abs() * cnt / n
            return ece

    tm.Metric = Metric
    tm.CalibrationError = CalibrationError
    sys.modules["torchmetrics"] = tm
    return tm


# ---------------------------------------------------------------------------
# torch.quantization legacy mapping aliases
# ---------------------------------------------------------------------------

def install_quant_mapping_aliases():
    import torch.quantization.quantization_mappings as qm
    added = []
    if not hasattr(qm, "QAT_MODULE_MAPPINGS"):
        qm.QAT_MODULE_MAPPINGS = dict(qm.get_default_qat_module_mappings())
        added.append("QAT_MODULE_MAPPINGS")
    if not hasattr(qm, "STATIC_QUANT_MODULE_MAPPINGS"):
        qm.STATIC_QUANT_MODULE_MAPPINGS = dict(
            qm.get_default_static_quant_module_mappings())
        added.append("STATIC_QUANT_MODULE_MAPPINGS")
    if not hasattr(qm, "get_qconfig_propagation_list"):
        qm.get_qconfig_propagation_list = \
            qm.get_default_qconfig_propagation_list
        added.append("get_qconfig_propagation_list")
    # `from ... import *` honours __all__ if the module defines one
    if hasattr(qm, "__all__"):
        for name in added:
            if name not in qm.__all__:
                qm.__all__.append(name)
    return qm


def install_swap_module_default():
    """torch 2.x swap_module requires custom_module_class_mapping; the
    reference calls it with two args (src/quant_utils.py:89)."""
    import importlib
    import inspect
    # the attribute torch.quantization.quantize is the quantize() FUNCTION;
    # go through importlib to get the submodule
    legacy_q = importlib.import_module("torch.quantization.quantize")
    sig = inspect.signature(legacy_q.swap_module)
    param = sig.parameters.get("custom_module_class_mapping")
    if param is not None and param.default is inspect.Parameter.empty:
        orig = legacy_q.swap_module

        def swap_module(mod, mapping, custom_module_class_mapping=None):
            return orig(mod, mapping, custom_module_class_mapping or {})

        legacy_q.swap_module = swap_module


def install_torch_legacy_aliases():
    """torch 2.x's torch.nn.quantized legacy shims omit the private names
    the reference imports; copy them over from torch.ao.nn.quantized."""
    pairs = [
        ("torch.nn.quantized.modules.conv",
         "torch.ao.nn.quantized.modules.conv", ["_ConvNd"]),
        ("torch.nn.quantized.modules.utils",
         "torch.ao.nn.quantized.modules.utils", ["_quantize_weight"]),
    ]
    import importlib
    for legacy_name, ao_name, names in pairs:
        legacy = importlib.import_module(legacy_name)
        ao = importlib.import_module(ao_name)
        for n in names:
            if not hasattr(legacy, n):
                setattr(legacy, n, getattr(ao, n))


def install_fuse_modules_adapter():
    """torch 2.x calls a user fuser_func with (mod_list, is_qat,
    fuser_method_mapping); the reference's fuse_bbb_modules takes only
    mod_list (src/models/stochastic/bbb/models_bbb.py:10-29,96)."""
    import torch.quantization as tq
    orig = tq.fuse_modules

    def fuse_modules(model, modules_to_fuse, inplace=False,
                     fuser_func=None, **kw):
        if fuser_func is None:
            return orig(model, modules_to_fuse, inplace=inplace, **kw)
        return orig(model, modules_to_fuse, inplace=inplace,
                    fuser_func=lambda mod_list, *rest: fuser_func(mod_list),
                    **kw)

    tq.fuse_modules = fuse_modules


def install_brewer2mpl():
    """Colour-palette stub for the reference's plot_settings (only
    .mpl_colors is consumed)."""
    m = types.ModuleType("brewer2mpl")

    class _Map:
        mpl_colors = [
            (0.894, 0.102, 0.110), (0.216, 0.494, 0.722),
            (0.302, 0.686, 0.290), (0.596, 0.306, 0.639),
            (1.000, 0.498, 0.000), (1.000, 1.000, 0.200),
            (0.651, 0.337, 0.157), (0.969, 0.506, 0.749),
            (0.600, 0.600, 0.600),
        ]

    m.get_map = lambda *a, **k: _Map()
    sys.modules["brewer2mpl"] = m
    return m


def install(reference_root: str = "/root/reference"):
    """Install every shim and put the reference on sys.path."""
    install_torchvision()
    install_torchmetrics()
    install_quant_mapping_aliases()
    install_torch_legacy_aliases()
    install_swap_module_default()
    install_fuse_modules_adapter()
    install_brewer2mpl()
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    import matplotlib
    matplotlib.use("Agg")
    # pre-register the reference's plot-aesthetics module: the real one
    # turns on text.usetex (no LaTeX on this host)
    import matplotlib.pyplot as plt
    ps = types.ModuleType("experiments.presentation.plot_settings")
    ps.PLT = plt
    ps.MLP = matplotlib
    ps.COLORS = list(sys.modules["brewer2mpl"].get_map().mpl_colors)
    ps.LINESTYLES = ["solid", "dashed", "dotted", "dashdot"]
    sys.modules["experiments.presentation.plot_settings"] = ps


def disable_usetex():
    """Belt-and-braces: ensure text.usetex stays off."""
    import matplotlib
    matplotlib.rcParams["text.usetex"] = False
