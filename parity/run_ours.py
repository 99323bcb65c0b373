#!/usr/bin/env python
"""Drive qbn_tpu on the shared parity dataset (CPU, same budget as the
reference run) and leave results.json in the experiment dir.

Mirrors parity/run_reference.py: only budget/data/seed are overridden;
hyperparameters come from qbn_tpu.presets (the reference scripts' own
defaults).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser("parity qbn_tpu driver")
    p.add_argument("--method", required=True, choices=[
        "pointwise", "bbb", "mcdropout", "sgld"])
    p.add_argument("--phase", required=True, choices=["float", "qat"])
    p.add_argument("--tier", default="mnist",
                   choices=["mnist", "regression", "cifar"])
    p.add_argument("--datasets", default=None,
                   help="regression tier: 'synthetic:1,housing:3' — "
                        "narrows REGRESSION_DATASETS (flows + harness) "
                        "to match the reference-side shim")
    p.add_argument("--data", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--epochs", type=int, required=True)
    p.add_argument("--load", default=None)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--samples", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.workdir, exist_ok=True)
    data = os.path.abspath(args.data)
    load = os.path.abspath(args.load) if args.load else None
    os.chdir(args.workdir)
    for path in (REPO, os.path.join(REPO, "experiments")):
        if path not in sys.path:
            sys.path.insert(0, path)
    import run  # experiments/run.py

    if args.datasets:
        spec = [(n, int(k)) for n, k in
                (s.split(":") for s in args.datasets.split(","))]
        import qbn_tpu.flows as flows
        import qbn_tpu.evaluation.harness as harness
        flows.REGRESSION_DATASETS = spec
        harness.REGRESSION_DATASETS = spec
        print(f"[parity] REGRESSION_DATASETS narrowed to {spec}",
              flush=True)

    argv2 = ["--method", args.method, "--tier", args.tier,
             "--phase", args.phase,
             "--data", data,
             "--epochs", str(args.epochs),
             "--seed", str(args.seed)]
    if args.samples is not None:
        argv2 += ["--samples", str(args.samples)]
    if args.batch_size is not None:
        argv2 += ["--batch_size", str(args.batch_size)]
    if args.phase == "qat":
        assert load, "--load required for qat phase"
        argv2 += ["--load", load]
    argv2 += list(args.extra)
    print(f"[parity] running qbn_tpu: {' '.join(argv2)}", flush=True)
    run.main(argv2)


if __name__ == "__main__":
    main()
