#!/usr/bin/env python
"""Write learnable synthetic UCI tables (housing, yacht) for the
regression parity protocol: BYTE-IDENTICAL on-disk inputs for the
unmodified torch reference (pandas read_csv, reference src/data.py:48-71)
and qbn_tpu (qbn_tpu/data/uci.py), in the datasets' native file formats.

Ground truth: y = w.x + b + 0.1 eps with dataset-specific fixed w — easy
enough to learn at reduced budget so RMSE/NLL compare the STACKS, not
the optimisation budget.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from qbn_tpu.data.writers import write_uci_table  # noqa: E402

SHAPES = {"housing": (506, 13), "yacht": (308, 6)}


def main(argv=None):
    p = argparse.ArgumentParser("parity UCI table writer")
    p.add_argument("--out", required=True, help="data root (UCI/ created)")
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args(argv)
    rng = np.random.RandomState(args.seed)
    for name, (n, d) in SHAPES.items():
        x = rng.randn(n, d)
        w = rng.randn(d) / np.sqrt(d)
        y = x @ w + 1.5 + 0.1 * rng.randn(n)
        table = np.concatenate([x, y[:, None]], axis=1)
        path = write_uci_table(args.out, name, table)
        print(f"wrote {path} ({n} rows, {d} features)")


if __name__ == "__main__":
    main()
