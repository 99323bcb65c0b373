#!/usr/bin/env python
"""Generate the shared parity dataset: a learnable synthetic MNIST-shaped
dataset (plus a FashionMNIST-shaped OOD set from a different seed) written
as real idx files, so the torch reference (via the torchvision shim) and
qbn_tpu (via its idx readers) train and evaluate on IDENTICAL bytes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qbn_tpu.data.synth import make_synth_images, make_synth_mnist  # noqa: E402
from qbn_tpu.data.synth import make_synth_cifar  # noqa: E402
from qbn_tpu.data.writers import (write_mnist_dir, write_cifar10_dir,
                                  write_svhn_mat)  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser("parity dataset generator")
    p.add_argument("--out", required=True)
    p.add_argument("--n_train", type=int, default=10000)
    p.add_argument("--n_test", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_shift", type=int, default=3)
    p.add_argument("--noise_sigma", type=float, default=25.0)
    p.add_argument("--cifar", action="store_true",
                   help="also write learnable synthetic CIFAR-10 pickles "
                        "+ SVHN .mat OOD (the cifar-tier parity cell)")
    args = p.parse_args(argv)

    x_tr, y_tr, x_te, y_te = make_synth_mnist(
        args.n_train, args.n_test, args.seed, max_shift=args.max_shift,
        noise_sigma=args.noise_sigma)
    write_mnist_dir(args.out, x_tr, y_tr, x_te, y_te, prefix="MNIST")

    # OOD stand-in ("random_mnist" = FashionMNIST in the reference):
    # same generator family, disjoint prototypes
    xo_tr, yo_tr = make_synth_images(512, (28, 28, 1), 10, 7777,
                                     proto_seed=9999)
    xo_te, yo_te = make_synth_images(args.n_test, (28, 28, 1), 10, 8888,
                                     proto_seed=9999)
    write_mnist_dir(args.out, xo_tr, yo_tr, xo_te, yo_te,
                    prefix="FashionMNIST")
    if args.cifar:
        xc_tr, yc_tr, xc_te, yc_te = make_synth_cifar(
            args.n_train, args.n_test, args.seed)
        write_cifar10_dir(args.out, xc_tr, yc_tr, xc_te, yc_te)
        # OOD ("random_cifar" = SVHN in the reference): disjoint protos
        xs, ys = make_synth_images(args.n_test, (32, 32, 3), 10, 8899,
                                   proto_seed=31337)
        write_svhn_mat(args.out, xs, ys, split="test")
    print(f"[parity] wrote dataset to {args.out} "
          f"(train {args.n_train}, test {args.n_test})")


if __name__ == "__main__":
    main()
