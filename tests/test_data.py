"""Data pipeline tests: loaders, distortions, UCI folds, augmentation."""

import numpy as np
import pytest

from qbn_tpu.config import Config
from qbn_tpu.data import (
    ArrayLoader, get_train_loaders, get_test_loader,
    regression_data_generator, apply_distortion, UCIDatasets,
)
from qbn_tpu.data.loaders import augment_cifar


def test_regression_generator_shape_and_function():
    x, y = regression_data_generator(n_points=200, seed=0)
    assert x.shape == (200, 1) and y.shape == (200, 1)
    xn, yn = regression_data_generator(n_points=200, noise=False, seed=0)
    np.testing.assert_allclose(yn, 2 * xn + 8, rtol=1e-5)


def test_array_loader_batches_and_counts():
    x = np.arange(25, dtype=np.float32).reshape(25, 1)
    y = np.arange(25)
    loader = ArrayLoader(x, y, batch_size=10, shuffle=False)
    assert len(loader) == 3
    assert loader.num_examples == 25
    batches = list(loader)
    assert batches[0][0].shape == (10, 1)
    assert batches[2][0].shape == (5, 1)
    # shuffled train loader keeps the ragged tail batch — torch
    # DataLoader drop_last=False semantics (reference src/data.py:182,
    # n_batches = len(loader) at src/trainer.py:140)
    tl = ArrayLoader(x, y, batch_size=10, shuffle=True, seed=0)
    assert len(tl) == 3
    sizes = [b[0].shape[0] for b in tl]
    assert sizes == [10, 10, 5]
    seen = np.sort(np.concatenate([b[1] for b in tl]))
    np.testing.assert_array_equal(seen, y)   # every example each epoch
    # explicit drop_last=True still available (perf paths)
    td = ArrayLoader(x, y, batch_size=10, shuffle=True, seed=0,
                     drop_last=True)
    assert len(td) == 2


def test_train_valid_split_portion():
    cfg = Config(dataset="regression_synthetic", batch_size=100,
                 valid_portion=0.2, seed=3)
    train, valid = get_train_loaders(cfg)
    assert train.num_examples == 800
    assert valid.num_examples == 200
    # n_points quirk: reference len(loader.dataset) is the PRE-split
    # dataset size for both loaders (src/trainer.py:140)
    assert train.dataset_size == 1000
    assert valid.dataset_size == 1000


def test_distortions():
    x = np.random.RandomState(0).rand(4, 28, 28, 1).astype(np.float32)
    rot = apply_distortion(x, "rotation", 2)   # 45 degrees
    assert rot.shape == x.shape and not np.allclose(rot, x)
    sh = apply_distortion(x, "shift", 0)       # 0.1 * 28 = 3 px
    np.testing.assert_allclose(sh[:, :, 3:, :], x[:, :, :-3, :])
    assert np.all(sh[:, :, :3, :] == 0)
    br = apply_distortion(x, "brightness", 4)  # x3.5 clamped
    assert br.max() <= 1.0 and br.mean() > x.mean()


def test_distorted_test_loader():
    cfg = Config(dataset="mnist", batch_size=256, data="./data")
    loader = get_test_loader(cfg, distortion="rotation", level=1)
    x, y = next(iter(loader))
    assert x.shape[1:] == (28, 28, 1)
    cfg = Config(dataset="random_mnist", batch_size=256, data="./data")
    ood = get_test_loader(cfg)
    x, y = next(iter(ood))
    assert x.shape[1:] == (28, 28, 1)


def test_uci_folds_standardised():
    ds = UCIDatasets("housing", data_path="./data", n_splits=10)
    xt, yt = ds.get_split(0, train=True)
    xe, ye = ds.get_split(0, train=False)
    assert xt.shape[1] == ds.in_dim
    # training fold standardised to ~zero mean / unit std
    np.testing.assert_allclose(xt.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(xt.std(0), 1.0, atol=1e-2)
    # folds are contiguous and disjoint
    tr0, te0 = ds.data_splits[0]
    tr1, te1 = ds.data_splits[1]
    assert len(np.intersect1d(te0, te1)) == 0
    assert len(te0) + len(tr0) == len(ds.data)


def test_cifar_augment_shapes():
    x = np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32)
    out = augment_cifar(x, np.random.RandomState(1))
    assert out.shape == x.shape
    assert not np.allclose(out, x)


def test_synthetic_standin_test_split_is_learnable():
    """Train and test stand-ins must share class prototypes: a
    nearest-class-mean classifier fit on train must beat chance by a
    wide margin on test (regression test for the seed+1 template bug
    that pinned every stand-in eval at ~0.9 error)."""
    from qbn_tpu.data.datasets import _fallback
    x_tr, y_tr = _fallback("cifar", 2000, 500, (32, 32, 3), 10, 33, True)
    x_te, y_te = _fallback("cifar", 2000, 500, (32, 32, 3), 10, 33, False)
    means = np.stack([x_tr[y_tr == c].mean(axis=0) for c in range(10)])
    d = ((x_te[:, None] - means[None]) ** 2).reshape(len(x_te), 10, -1)
    pred = d.sum(-1).argmin(1)
    acc = (pred == y_te).mean()
    assert acc > 0.9, acc
    # the OOD stand-in (svhn) keeps DISJOINT prototypes
    x_ood, y_ood = _fallback("svhn", 2000, 500, (32, 32, 3), 10, 44,
                             False)
    d = ((x_ood[:, None] - means[None]) ** 2).reshape(len(x_ood), 10, -1)
    acc_ood = (d.sum(-1).argmin(1) == y_ood).mean()
    assert acc_ood < 0.3, acc_ood


@pytest.mark.smoke
def test_uci_synthetic_table_stable_across_processes():
    """The UCI fallback table must be BYTE-IDENTICAL in every process:
    it was seeded from salted str hash(), so a quant run (its own
    process) regenerated different data than the float run that trained
    the checkpoint it loads — every campaign UCI INT cell collapsed to
    constant-prediction RMSE while float metrics stayed healthy."""
    import hashlib
    import subprocess
    import sys

    from qbn_tpu.data import uci

    here = hashlib.sha256(
        uci._synthetic_table("housing").tobytes()).hexdigest()
    code = ("import hashlib, sys; sys.path.insert(0, %r); "
            "from qbn_tpu.data import uci; "
            "print(hashlib.sha256("
            "uci._synthetic_table('housing').tobytes()).hexdigest())"
            ) % (str((__import__('pathlib').Path(__file__).parent.parent)),)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, check=True)
    assert out.stdout.strip().splitlines()[-1] == here
