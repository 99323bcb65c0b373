#!/usr/bin/env python
"""Drive the UNMODIFIED torch reference on this host's CPU for the
accuracy-parity protocol (docs/PARITY.md).

Runs the reference's own runner scripts (e.g.
experiments/scripts/stochastic/bbb/float/bbb_mnist.py) via runpy with a
synthesized argv, inside a scratch working directory, with the
compatibility shims from parity.torch_compat installed. All
hyperparameters come from the scripts' own argparse defaults — only the
budget (--epochs), data root, seed, and device (--gpu -1 = CPU) are
overridden, mirroring what run_all_float.sh / run_all_quant.sh pass.

Usage:
  python parity/run_reference.py --method bbb --phase float \
      --data parity_data --workdir /tmp/parity/ref --epochs 20
  python parity/run_reference.py --method bbb --phase qat \
      --data parity_data --workdir /tmp/parity/ref \
      --load <float-exp-dir> --epochs 10
"""

from __future__ import annotations

import argparse
import os
import runpy
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

SCRIPTS = {
    ("pointwise", "float"): "experiments/scripts/pointwise/float/pointwise_mnist.py",
    ("pointwise", "qat"): "experiments/scripts/pointwise/quantised/train/pointwise_mnist.py",
    ("bbb", "float"): "experiments/scripts/stochastic/bbb/float/bbb_mnist.py",
    ("bbb", "qat"): "experiments/scripts/stochastic/bbb/quantised/train/bbb_mnist.py",
    ("mcdropout", "float"): "experiments/scripts/stochastic/mcdropout/float/mcdropout_mnist.py",
    ("mcdropout", "qat"): "experiments/scripts/stochastic/mcdropout/quantised/train/mcdropout_mnist.py",
    ("sgld", "float"): "experiments/scripts/stochastic/sgld/float/sgld_mnist.py",
    ("sgld", "qat"): "experiments/scripts/stochastic/sgld/quantised/train/sgld_mnist.py",
}


def main(argv=None):
    p = argparse.ArgumentParser("parity reference driver")
    p.add_argument("--method", required=True, choices=[
        "pointwise", "bbb", "mcdropout", "sgld"])
    p.add_argument("--phase", required=True, choices=["float", "qat"])
    p.add_argument("--tier", default="mnist",
                   choices=["mnist", "regression", "cifar"],
                   help="selects the *_mnist.py or *_regression.py "
                        "runner script")
    p.add_argument("--datasets", default=None,
                   help="regression tier only: 'synthetic:1,housing:3' "
                        "— shims experiments.utils.REGRESSION_DATASETS "
                        "to this (name, folds) list for a reduced-budget "
                        "parity run")
    p.add_argument("--data", required=True,
                   help="dataset root (MNIST/raw idx files etc.)")
    p.add_argument("--workdir", required=True,
                   help="scratch cwd; the reference creates its exp dir here")
    p.add_argument("--epochs", type=int, required=True)
    p.add_argument("--load", default=None,
                   help="float experiment dir (qat phase)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--samples", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                   help="extra raw flags passed to the reference script")
    args = p.parse_args(argv)

    script = os.path.join(REFERENCE, SCRIPTS[(args.method, args.phase)])
    if args.tier != "mnist":
        script = script.replace("_mnist.py", f"_{args.tier}.py")
    os.makedirs(args.workdir, exist_ok=True)
    data = os.path.abspath(args.data)
    if args.tier == "regression":
        # the reference's UCIDatasets string-concatenates
        # data_path+"UCI" (reference: src/data.py:38-45) — without the
        # trailing separator it looks for (and tries to download to)
        # "<data>UCI" and hits the zero-egress wall
        data += os.sep
    load = os.path.abspath(args.load) if args.load else None
    os.chdir(args.workdir)

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from parity.torch_compat import install
    install(REFERENCE)

    if args.datasets:
        # shim (not a source edit): the runner scripts re-import
        # REGRESSION_DATASETS from experiments.utils at run_path time,
        # so patching the module narrows the grid for both training and
        # evaluate_regression_uncertainty
        spec = [(n, int(k)) for n, k in
                (s.split(":") for s in args.datasets.split(","))]
        import experiments.utils as eu
        eu.REGRESSION_DATASETS = spec
        print(f"[parity] REGRESSION_DATASETS shimmed to {spec}",
              flush=True)

    argv2 = [script,
             "--data", data,
             "--gpu", "-1",
             "--num_workers", "0",
             "--epochs", str(args.epochs),
             "--seed", str(args.seed)]
    if args.samples is not None:
        argv2 += ["--samples", str(args.samples)]
    if args.batch_size is not None:
        argv2 += ["--batch_size", str(args.batch_size)]
    if args.phase == "qat":
        assert load, "--load required for qat phase"
        argv2 += ["--load", load, "--q", "--at"]
    argv2 += list(args.extra)

    sys.argv = argv2
    print(f"[parity] running reference: {' '.join(argv2)}", flush=True)
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
