#!/usr/bin/env python
"""Generate the REAL-data regression parity dataset: sklearn's bundled
diabetes study (Efron et al. 2004 LARS paper data — 442 real patients,
10 raw physiological measurements, disease-progression target; shipped
inside scikit-learn, so available on this zero-egress host), written in
the UCI housing slot's on-disk format (whitespace table + header row,
reference src/data.py:48-50) so the UNMODIFIED torch reference and
qbn_tpu read IDENTICAL bytes.

The slot name is plumbing only: the reference's UCIDatasets knows a
fixed set of six dataset names (src/data.py:23-28) and neither stack
hardcodes the column count, so real diabetes rows flow through the same
10-fold split + per-fold standardisation as any UCI table.

raw (unscaled) measurements on purpose: both stacks' per-fold
standardisation is part of the pipeline under test.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("real-diabetes parity table writer")
    p.add_argument("--out", required=True, help="data root (UCI/ created)")
    args = p.parse_args(argv)

    from sklearn.datasets import load_diabetes
    d = load_diabetes(scaled=False)
    x = np.asarray(d.data, np.float64)          # (442, 10) raw clinical
    y = np.asarray(d.target, np.float64)        # disease progression
    table = np.concatenate([x, y[:, None]], axis=1)

    uci = os.path.join(args.out, "UCI")
    os.makedirs(uci, exist_ok=True)
    path = os.path.join(uci, "housing.data")
    header = " ".join(
        list(d.feature_names) + ["progression"])
    with open(path, "w") as f:
        f.write(header + "\n")
        for row in table:
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
    print(f"[parity] wrote REAL diabetes table to {path} "
          f"({table.shape[0]} patients, {table.shape[1] - 1} features)")


if __name__ == "__main__":
    main()
