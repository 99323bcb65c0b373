"""Batch loaders + the reference's train/valid/test loader API.

Replaces torch DataLoader + SubsetRandomSampler (reference:
src/data.py:138-265) with an in-memory numpy loader: datasets here are at
most a few hundred MB, so the TPU-friendly design is whole-dataset-in-host-
memory, per-epoch shuffling, batch-level augmentation, and fixed-size
batches (a partial tail batch would trigger an extra XLA compilation; we
drop it for training and keep it for evaluation where exact counts matter).
"""

from __future__ import annotations

import logging
import math
from typing import Callable, Optional, Tuple

import numpy as np

from qbn_tpu.data import datasets as D
from qbn_tpu.data.distortions import apply_distortion

log = logging.getLogger(__name__)


def augment_cifar(x: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Random crop (pad 4, zero fill) + horizontal flip, per batch
    (reference transform list, src/data.py:148-154). Runs on the native
    threaded C++ pipeline when available (qbn_tpu.data.native); the numpy
    fallback is bit-identical given the same sampled parameters."""
    n, h, w, c = x.shape
    ys, xs, flip = cifar_augment_params(rng, n)
    from qbn_tpu.data import native
    if native.available():
        return native.cifar_augment(x, ys, xs, flip)
    out = np.empty_like(x)
    pad = np.zeros((h + 8, w + 8, c), x.dtype)
    for i in range(n):
        base = x[i, :, ::-1, :] if flip[i] else x[i]
        pad[:] = 0
        pad[4:4 + h, 4:4 + w, :] = base
        out[i] = pad[ys[i]:ys[i] + h, xs[i]:xs[i] + w, :]
    return out


def cifar_augment_params(rng: np.random.RandomState, n: int):
    """The exact RNG draws augment_cifar makes for an n-image batch.

    Split out so the device-resident epoch scan (training/trainer.py) can
    consume the loader's RandomState IDENTICALLY to the host path and
    replay the crop/flip on device bit-for-bit."""
    ys = rng.randint(0, 9, n)
    xs = rng.randint(0, 9, n)
    flip = (rng.rand(n) < 0.5).astype(np.uint8)
    return ys, xs, flip


class ArrayLoader:
    """Shuffling mini-batch iterator over in-memory arrays.

    Yields (x, y) numpy batches. Exposes len() (number of batches) and
    num_examples (dataset size) for the loss scaling terms
    (reference: trainer.py:140 n_batches/n_points).
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 augment: Optional[Callable] = None,
                 normalize: Optional[Callable] = None,
                 drop_last: Optional[bool] = None):
        self.x = x
        self.y = y
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.normalize = normalize
        self.rng = np.random.RandomState(seed)
        self.normalize_kind = None   # set by loader factories; names a
        # device-replayable normalize recipe for the epoch-scan path
        # torch DataLoader default: the ragged tail batch IS trained and
        # counted in len(loader) (reference: src/data.py:182-184 passes
        # no drop_last; src/trainer.py:140 n_batches = len(loader)).
        self.drop_last = False if drop_last is None else drop_last
        # reference n_points = len(loader.dataset) — the FULL pre-split
        # dataset (src/trainer.py:140); get_train_loaders overrides this
        # to the pre-valid-split size.
        self.dataset_size = len(x)
        n = len(x)
        if self.drop_last and n >= batch_size:
            self._len = n // batch_size
        else:
            self._len = max(1, math.ceil(n / batch_size))

    @property
    def num_examples(self) -> int:
        return len(self.x)

    def __len__(self) -> int:
        return self._len

    def __iter__(self):
        n = len(self.x)
        idx = self.rng.permutation(n) if self.shuffle else np.arange(n)
        for b in range(self._len):
            sel = idx[b * self.batch_size: (b + 1) * self.batch_size]
            xb = self.x[sel]
            if self.augment is not None:
                xb = self.augment(xb, self.rng)
            if self.normalize is not None:
                xb = self.normalize(xb)
            yield xb, self.y[sel]

    def epoch_plan(self):
        """Advance the loader's RandomState exactly one epoch and return
        (idx, aug_params): the permutation and, for the CIFAR augmenter,
        stacked per-batch (ys, xs, flip) crop/flip draws — the device-
        resident epoch scan replays them on device bit-for-bit. Consumes
        the SAME draws in the SAME order as one __iter__ pass, so scanned
        and host epochs interleave/compare exactly."""
        n = len(self.x)
        idx = self.rng.permutation(n) if self.shuffle else np.arange(n)
        k_full = min(self._len, n // self.batch_size)
        aug = tail_aug = None
        if self.augment is not None:
            if self.augment is not augment_cifar:
                raise ValueError("epoch_plan: unknown augmenter")
            draws = [cifar_augment_params(
                self.rng,
                len(idx[b * self.batch_size:(b + 1) * self.batch_size]))
                for b in range(self._len)]
            aug = tuple(np.stack([d[i] for d in draws[:k_full]])
                        for i in range(3))
            if self._len > k_full:
                # ragged tail batch: its draws can't be stacked with the
                # full-size ones — returned separately for the tail step
                tail_aug = draws[k_full]
        return idx, aug, tail_aug


def _train_valid_split(x, y, valid_portion: float, seed: int):
    """Random subset split (reference: src/data.py:172-196 — first
    valid_portion of a random permutation is the validation set)."""
    n = len(x)
    idx = np.random.RandomState(seed).permutation(n)
    n_valid = int(np.floor(valid_portion * n))
    v_idx, t_idx = idx[:n_valid], idx[n_valid:]
    return (x[t_idx], y[t_idx]), (x[v_idx], y[v_idx])


def get_train_loaders(cfg, split: int = -1
                      ) -> Tuple[ArrayLoader, Optional[ArrayLoader]]:
    """Train + validation loaders for cfg.dataset
    (reference: src/data.py:138-196)."""
    assert 0 <= cfg.valid_portion < 1.0
    augment = None
    normalize = None
    if cfg.dataset == "mnist":
        x, y = D.load_images("mnist", cfg.data, train=True)
    elif cfg.dataset == "cifar":
        x, y = D.load_images("cifar", cfg.data, train=True)
        augment = augment_cifar
        normalize = lambda a: D.normalize(a, "cifar")  # noqa: E731
    elif "regression" in cfg.dataset:
        if cfg.dataset == "regression_synthetic":
            x, y = D.regression_data_generator(n_points=1000, seed=cfg.seed)
        else:
            from qbn_tpu.data.uci import UCIDatasets
            name = cfg.dataset.split("_")[-1]
            x, y = UCIDatasets(name, cfg.data).get_split(split, train=True)
    else:
        raise NotImplementedError("Other datasets not implemented")

    (xt, yt), (xv, yv) = _train_valid_split(x, y, cfg.valid_portion,
                                            cfg.seed)
    kind = "cifar" if cfg.dataset == "cifar" else None
    train = ArrayLoader(xt, yt, cfg.batch_size, shuffle=True, seed=cfg.seed,
                        augment=augment, normalize=normalize)
    train.normalize_kind = kind
    # reference quirk kept on purpose: n_points = len(loader.dataset) is
    # the dataset size BEFORE the valid split (SubsetRandomSampler over
    # the full train_data, src/data.py:174-186 + src/trainer.py:140)
    train.dataset_size = len(x)
    valid = None
    if cfg.valid_portion > 0:
        valid = ArrayLoader(xv, yv, cfg.batch_size, shuffle=False,
                            normalize=normalize)
        valid.normalize_kind = kind
        valid.dataset_size = len(x)
    log.info("train size %d, valid size %d", len(xt), len(xv))
    return train, valid


def get_test_loader(cfg, distortion: Optional[str] = None, level: int = -1,
                    split: int = -1) -> ArrayLoader:
    """Test loader, optionally distortion-shifted, plus the OOD sets
    random_mnist (FashionMNIST) and random_cifar (SVHN)
    (reference: src/data.py:199-265)."""
    normalize = None
    if cfg.dataset in ("mnist", "cifar"):
        x, y = D.load_images(cfg.dataset, cfg.data, train=False)
        x = apply_distortion(x, distortion, level)
        if cfg.dataset == "cifar":
            normalize = lambda a: D.normalize(a, "cifar")  # noqa: E731
    elif cfg.dataset == "random_mnist":
        x, y = D.load_images("fashion_mnist", cfg.data, train=False)
    elif cfg.dataset == "random_cifar":
        x, y = D.load_images("svhn", cfg.data, train=False)
        normalize = lambda a: D.normalize(a, "cifar")  # noqa: E731
    elif "regression" in cfg.dataset:
        if cfg.dataset == "regression_synthetic":
            x, y = D.regression_data_generator(n_points=1000, noise=False,
                                               seed=cfg.seed + 1)
        else:
            from qbn_tpu.data.uci import UCIDatasets
            name = cfg.dataset.split("_")[-1]
            x, y = UCIDatasets(name, cfg.data).get_split(split, train=False)
    else:
        raise NotImplementedError("Other datasets not implemented")
    log.info("test size %d", len(x))
    return ArrayLoader(x, y, cfg.batch_size, shuffle=False,
                       normalize=normalize)
