#!/usr/bin/env python
"""Generate the REAL-data parity dataset: sklearn's bundled handwritten
digits (UCI Optical Recognition of Handwritten Digits — 1797 real scanned
8x8 images, shipped inside scikit-learn, so available on this zero-egress
host) upsampled to the MNIST 28x28 frame and written as idx files.

This upgrades the parity protocol from learnable-synthetic data to real
image data while keeping the contract: the torch reference (torchvision
shim) and qbn_tpu read IDENTICAL bytes.

Layout decisions (all deterministic):
  * 8x8 (values 0..16) -> x3 nearest-neighbour -> 24x24, pad 2 -> 28x28,
    values scaled to 0..255 uint8 (preserves stroke geometry; both stacks
    then apply the standard MNIST normalisation).
  * split: seeded permutation, 1437 train / 360 test (80/20).
  * OOD set ("random" split = FashionMNIST slot): INVERTED digits
    (255 - x) from the test half — real-data-derived, clearly
    off-manifold for a model trained on dark-background digits.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qbn_tpu.data.writers import write_mnist_dir  # noqa: E402


def load_digits_28(seed: int = 0):
    from sklearn.datasets import load_digits
    d = load_digits()
    x = d.images.astype(np.float32)          # (1797, 8, 8), values 0..16
    y = d.target.astype(np.int64)
    x = np.round(x * (255.0 / 16.0)).astype(np.uint8)
    x = np.repeat(np.repeat(x, 3, axis=1), 3, axis=2)      # 24x24
    x = np.pad(x, ((0, 0), (2, 2), (2, 2)))                # 28x28
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(x))
    n_tr = int(0.8 * len(x))
    tr, te = order[:n_tr], order[n_tr:]
    return x[tr], y[tr], x[te], y[te]


def main(argv=None):
    p = argparse.ArgumentParser("real-digits parity dataset generator")
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    x_tr, y_tr, x_te, y_te = load_digits_28(args.seed)
    write_mnist_dir(args.out, x_tr, y_tr, x_te, y_te, prefix="MNIST")
    # OOD: inverted digits (real-data-derived, off-manifold)
    write_mnist_dir(args.out, 255 - x_tr[:512], y_tr[:512],
                    255 - x_te, y_te, prefix="FashionMNIST")
    print(f"[parity] wrote REAL digits dataset to {args.out} "
          f"(train {len(y_tr)}, test {len(y_te)}, 28x28 from 8x8 x3+pad)")


if __name__ == "__main__":
    main()
