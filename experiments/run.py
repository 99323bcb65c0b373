#!/usr/bin/env python
"""Unified experiment CLI — replaces the reference's 24 runner scripts.

Examples (reference equivalents in parentheses):

  # float BBB CIFAR (stochastic/bbb/float/bbb_cifar.py)
  python experiments/run.py --method bbb --tier cifar --phase float

  # QAT fine-tune at A7W8 from a float run (quantised/train/bbb_cifar.py)
  python experiments/run.py --method bbb --tier cifar --phase qat \
      --load not_q-cifar-classification-20260816-120000 \
      --activation_precision 7 --weight_precision 8

  # full regression tier (synthetic + 6 UCI x 10 folds)
  python experiments/run.py --method mcdropout --tier regression

Any Config field can be overridden by flag (e.g. --epochs 2 --debug).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if os.environ.get("QBN_CPU"):
    # Run this experiment on the host CPU (e.g. while the single TPU is
    # busy). The axon relay's register hook clobbers JAX_PLATFORMS, so the
    # only reliable switch is jax.config before first backend init.
    import jax
    jax.config.update("jax_platforms", "cpu")

from qbn_tpu.config import Config  # noqa: E402
from qbn_tpu.presets import preset  # noqa: E402


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("qbn_tpu experiment runner")
    p.add_argument("--method", required=True,
                   choices=["pointwise", "mcdropout", "bbb", "sgld"])
    p.add_argument("--tier", required=True,
                   choices=["regression", "mnist", "cifar"])
    p.add_argument("--phase", default="float", choices=["float", "qat"])
    p.add_argument("--load", default=None,
                   help="experiment dir with float checkpoints (qat phase)")
    # expose every Config field as an override flag
    for f in dataclasses.fields(Config):
        if f.name in ("load",):
            continue
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(f"--{f.name}", action="store_true",
                           default=None)
        else:
            p.add_argument(f"--{f.name}", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    overrides = {}
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name, None)
        if v is None:
            continue
        if isinstance(f.default, bool):
            overrides[f.name] = bool(v)
        elif isinstance(f.default, int) and not isinstance(f.default, bool):
            overrides[f.name] = int(v)
        elif isinstance(f.default, float):
            overrides[f.name] = float(v)
        elif isinstance(f.default, tuple):
            overrides[f.name] = tuple(
                int(p) for p in str(v).replace(",", " ").split())
        else:
            overrides[f.name] = v
    cfg = preset(args.method, args.tier, args.phase, **overrides)

    from qbn_tpu.flows import (
        setup_experiment, run_float_classification, run_float_regression,
        run_qat_classification, run_qat_regression,
    )
    cfg = setup_experiment(cfg)
    if args.phase == "float":
        if args.tier == "regression":
            run_float_regression(cfg)
        else:
            run_float_classification(cfg)
    else:
        if not args.load:
            raise SystemExit("--load <float experiment dir> is required "
                             "for --phase qat")
        if args.tier == "regression":
            run_qat_regression(cfg, args.load)
        else:
            run_qat_classification(cfg, args.load)
    # end-of-run marker: grid drivers (experiments/sweep.py) use it to skip
    # completed cells when a multi-hour stage is interrupted and resumed
    with open(os.path.join(cfg.save, "DONE"), "w") as fh:
        fh.write("ok\n")


if __name__ == "__main__":
    main()
