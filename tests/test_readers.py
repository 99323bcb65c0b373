"""Real-file reader round trips: write tiny fixtures in each on-disk format
and assert the readers recover exact shapes/values/labels.

These are the only code paths that run on a data-bearing host
(reference equivalents: torchvision downloads, src/data.py:138-265), so
they must be covered even though this host has no real datasets.
"""

import numpy as np
import pytest

from qbn_tpu.data.datasets import load_images
from qbn_tpu.data.uci import UCIDatasets
from qbn_tpu.data.writers import (
    write_mnist_dir, write_cifar10_dir, write_svhn_mat, write_uci_table,
    write_idx_images, write_idx_labels,
)


def _images(n, shape, seed):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 256, (n,) + shape, dtype=np.uint8)
    y = rng.randint(0, 10, n).astype(np.int64)
    return x, y


def test_idx_round_trip(tmp_path):
    x_tr, y_tr = _images(7, (28, 28, 1), 0)
    x_te, y_te = _images(5, (28, 28, 1), 1)
    write_mnist_dir(str(tmp_path), x_tr, y_tr, x_te, y_te)
    for train, (x, y) in ((True, (x_tr, y_tr)), (False, (x_te, y_te))):
        rx, ry = load_images("mnist", str(tmp_path), train=train)
        assert rx.shape == x.shape and rx.dtype == np.float32
        np.testing.assert_allclose(rx, x.astype(np.float32) / 255.0)
        np.testing.assert_array_equal(ry, y)


def test_idx_bad_magic_rejected(tmp_path):
    p = tmp_path / "train-images-idx3-ubyte"
    # a label file (magic 2049) in the image slot, long enough to parse
    write_idx_labels(str(p), np.zeros(32, np.uint8))
    write_idx_labels(str(tmp_path / "train-labels-idx1-ubyte"),
                     np.zeros(32, np.uint8))
    with pytest.raises(AssertionError):
        load_images("mnist", str(tmp_path), train=True)


def test_cifar_round_trip(tmp_path):
    x_tr, y_tr = _images(10, (32, 32, 3), 2)
    x_te, y_te = _images(4, (32, 32, 3), 3)
    write_cifar10_dir(str(tmp_path), x_tr, y_tr, x_te, y_te)
    rx, ry = load_images("cifar", str(tmp_path), train=True)
    # NHWC order must survive the CHW-flattened pickle rows
    np.testing.assert_allclose(rx, x_tr.astype(np.float32) / 255.0)
    np.testing.assert_array_equal(ry, y_tr)
    rx, ry = load_images("cifar", str(tmp_path), train=False)
    np.testing.assert_allclose(rx, x_te.astype(np.float32) / 255.0)
    np.testing.assert_array_equal(ry, y_te)


def test_svhn_round_trip(tmp_path):
    x, y = _images(6, (32, 32, 3), 4)
    y[0] = 0  # exercises the 10 <-> 0 label convention
    write_svhn_mat(str(tmp_path), x, y, split="test")
    rx, ry = load_images("svhn", str(tmp_path), train=False)
    np.testing.assert_allclose(rx, x.astype(np.float32) / 255.0)
    np.testing.assert_array_equal(ry, y)


@pytest.mark.parametrize("name", ["housing", "yacht", "wine", "concrete"])
def test_uci_round_trip(tmp_path, name):
    rng = np.random.RandomState(5)
    table = np.round(rng.randn(24, 5), 6)
    write_uci_table(str(tmp_path), name, table)
    ds = UCIDatasets(name, str(tmp_path), n_splits=4)
    np.testing.assert_allclose(ds.data, table, rtol=0, atol=1e-12)
    # fold standardisation: training fold has ~zero mean / unit std
    x_tr, y_tr = ds.get_split(0, train=True)
    assert x_tr.shape == (18, 4) and y_tr.shape == (18, 1)
    np.testing.assert_allclose(x_tr.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(x_tr.std(0), 1.0, atol=1e-4)
    # test fold standardised by TRAIN stats (reference: src/data.py:88-95)
    x_te, y_te = ds.get_split(0, train=False)
    assert x_te.shape == (6, 4)
    tr_idx, te_idx = ds.data_splits[0]
    m = table[tr_idx, :4].mean(0)
    s = table[tr_idx, :4].var(0) ** 0.5
    np.testing.assert_allclose(
        x_te, (table[te_idx, :4] - m) / s, rtol=1e-5)


def test_synth_images_learnable_and_deterministic():
    from qbn_tpu.data.synth import make_synth_mnist
    x1, y1, xt1, yt1 = make_synth_mnist(256, 128, seed=7)
    x2, y2, _, _ = make_synth_mnist(256, 128, seed=7)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    assert x1.dtype == np.uint8 and x1.shape == (256, 28, 28, 1)
    # GENERALISATION structure: a nearest-class-mean classifier fit on
    # TRAIN must classify the held-out TEST split well above chance
    # (train and test share prototypes but draw independent noise/shifts)
    protos = np.stack([x1[y1 == k].mean(0) for k in range(10)])
    d = ((xt1[:, None].astype(np.float32)
          - protos[None].astype(np.float32)) ** 2).sum((2, 3, 4))
    acc = (d.argmin(1) == yt1).mean()
    assert acc > 0.5, f"synthetic classes not learnable (test acc={acc})"
