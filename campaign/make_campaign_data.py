#!/usr/bin/env python
"""Generate the reference-scale campaign dataset (zero-egress stand-in).

The reference trains on real MNIST (60k/10k), CIFAR-10 (50k/10k) and uses
FashionMNIST / SVHN as OOD sets (reference: src/data.py:138-259). This host
has no real bytes, so the campaign uses the same learnable synthetic
generator family as the accuracy-parity harness (qbn_tpu.data.synth),
written to disk in the REAL formats at the REAL split sizes, so every
reader, augmentation, distortion and OOD path runs exactly as it would on
the real data. Deterministic: regenerate with this script; per-file sha256
recorded in MANIFEST.txt for provenance.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qbn_tpu.data.synth import make_synth_images, make_synth_mnist, \
    make_synth_cifar  # noqa: E402
from qbn_tpu.data.writers import (write_mnist_dir, write_cifar10_dir,
                                  write_svhn_mat)  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser("campaign dataset generator")
    p.add_argument("--out", default="/root/campaign_data")
    p.add_argument("--seed", type=int, default=0)
    # MNIST-tier difficulty: the hard-parity settings (docs/PARITY_HARD.md)
    # keep LeNet clean-test error non-saturated, so the 4-method campaign
    # figures (error/ECE candlesticks, bit-width lines) carry real spread
    # instead of every cell pinning at ~0
    p.add_argument("--mnist_noise_sigma", type=float, default=160.0)
    p.add_argument("--mnist_max_shift", type=int, default=8)
    args = p.parse_args(argv)

    # MNIST tier: 60k/10k (reference: torchvision MNIST split sizes)
    x_tr, y_tr, x_te, y_te = make_synth_mnist(
        60000, 10000, args.seed, max_shift=args.mnist_max_shift,
        noise_sigma=args.mnist_noise_sigma)
    write_mnist_dir(args.out, x_tr, y_tr, x_te, y_te, prefix="MNIST")
    # OOD = FashionMNIST stand-in: disjoint prototypes (proto_seed 9999,
    # same family/seeds as the parity harness, parity/make_data.py)
    xo_tr, yo_tr = make_synth_images(512, (28, 28, 1), 10, 7777,
                                     proto_seed=9999)
    xo_te, yo_te = make_synth_images(10000, (28, 28, 1), 10, 8888,
                                     proto_seed=9999)
    write_mnist_dir(args.out, xo_tr, yo_tr, xo_te, yo_te,
                    prefix="FashionMNIST")

    # CIFAR tier: 50k/10k
    xc_tr, yc_tr, xc_te, yc_te = make_synth_cifar(50000, 10000, args.seed)
    write_cifar10_dir(args.out, xc_tr, yc_tr, xc_te, yc_te)
    # OOD = SVHN stand-in (reference uses the 26k SVHN test split; the
    # stand-in uses 10k to bound eval cost — OOD metrics are set averages,
    # so the split size does not change their meaning)
    xs, ys = make_synth_images(10000, (32, 32, 3), 10, 8899,
                               proto_seed=31337)
    write_svhn_mat(args.out, xs, ys, split="test")

    # provenance manifest
    lines = []
    for root, _, files in os.walk(args.out):
        for f in sorted(files):
            if f == "MANIFEST.txt":
                continue
            path = os.path.join(root, f)
            h = hashlib.sha256(open(path, "rb").read()).hexdigest()
            lines.append(f"{h}  {os.path.relpath(path, args.out)}")
    with open(os.path.join(args.out, "MANIFEST.txt"), "w") as fh:
        fh.write("\n".join(sorted(lines, key=lambda s: s.split()[-1])) + "\n")
    print(f"[campaign] wrote reference-scale dataset to {args.out}")
    print("\n".join(sorted(lines, key=lambda s: s.split()[-1])))


if __name__ == "__main__":
    main()
