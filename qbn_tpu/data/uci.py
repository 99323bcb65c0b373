"""UCI regression datasets: local files, contiguous K-fold, per-fold
standardisation.

Reference behaviour (reference: src/data.py:20-103): 6 UCI datasets split
by sklearn KFold (default: contiguous, unshuffled) into 10 folds; features
and targets are standardised by the training fold's mean/std. Downloads are
impossible on this zero-egress host, so files are read from
<data_dir>/UCI/ when present; otherwise a deterministic synthetic
linear-plus-noise table with the dataset's (n, d) signature is generated so
fold logic and evaluation code run identically.
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Tuple

import numpy as np

log = logging.getLogger(__name__)

# name -> (filename candidates, loader kind, (n_rows, in_dim) for fallback)
_SPECS = {
    "housing": (["housing.data"], "whitespace", (506, 13)),
    "concrete": (["Concrete_Data.xls", "concrete.csv"], "excel", (1030, 8)),
    "energy": (["ENB2012_data.xlsx", "energy.csv"], "excel", (768, 8)),
    "power": (["CCPP/Folds5x2_pp.xlsx", "power.csv"], "excel", (9568, 4)),
    "wine": (["winequality-red.csv"], "semicolon", (1599, 11)),
    "yacht": (["yacht_hydrodynamics.data"], "whitespace", (308, 6)),
}

UCI_NAMES = list(_SPECS)


def _kfold_indices(n: int, n_splits: int):
    """Contiguous unshuffled K-fold (sklearn KFold default semantics)."""
    sizes = np.full(n_splits, n // n_splits, dtype=int)
    sizes[: n % n_splits] += 1
    splits = []
    start = 0
    idx = np.arange(n)
    for s in sizes:
        test = idx[start:start + s]
        train = np.concatenate([idx[:start], idx[start + s:]])
        splits.append((train, test))
        start += s
    return splits


def _load_file(data_dir: str, name: str):
    files, kind, _ = _SPECS[name]
    for f in files:
        path = os.path.join(data_dir, "UCI", f)
        if not os.path.exists(path):
            continue
        if kind == "whitespace":
            import pandas as pd
            # header-row consumption like the reference: housing header=0
            # (1 row consumed), yacht header=1 (2 rows consumed)
            skip = 2 if name == "yacht" else 1
            return pd.read_csv(path, header=None, skiprows=skip,
                               delimiter=r"\s+").values.astype(np.float64)
        if kind == "semicolon":
            import pandas as pd
            return pd.read_csv(path, header=1,
                               delimiter=";").values.astype(np.float64)
        if kind == "excel":
            import pandas as pd
            if path.endswith(".csv"):
                return pd.read_csv(path).values.astype(np.float64)
            try:
                return pd.read_excel(path, header=0).values.astype(np.float64)
            except Exception as e:  # missing engine on bare host
                log.warning("excel read failed for %s: %s", path, e)
                return None
    return None


_SYNTH_WARNED = set()


def _synthetic_table(name: str):
    n, d = _SPECS[name][2]
    # Seed from a PROCESS-STABLE digest of the dataset name. Python's
    # str hash() is salted per interpreter (PYTHONHASHSEED unset), so
    # seeding from it regenerated a DIFFERENT table in every process:
    # a quant run (its own process) then fine-tuned float checkpoints
    # against data they were never trained on, collapsing every UCI INT
    # cell to constant-prediction RMSE (~sqrt(d) target variance) while
    # float metrics — trained and evaluated within one process — stayed
    # healthy. Real on-disk tables (parity, production) never hit this
    # fallback path.
    digest = hashlib.sha256(name.encode()).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "little"))
    x = rng.randn(n, d)
    w = rng.randn(d, 1)
    y = x @ w + 0.3 * rng.randn(n, 1)
    if name not in _SYNTH_WARNED:
        log.warning("UCI dataset '%s' not found on disk — using synthetic "
                    "stand-in (%d rows, %d features)", name, n, d)
        _SYNTH_WARNED.add(name)
    return np.concatenate([x, y], axis=1)


class UCIDatasets:
    """K-fold UCI regression dataset with per-fold standardisation."""

    def __init__(self, name: str, data_path: str = "", n_splits: int = 10):
        if name not in _SPECS:
            raise Exception("Not known dataset!")
        self.name = name
        self.n_splits = n_splits
        data = _load_file(data_path, name)
        if data is None:
            data = _synthetic_table(name)
        self.data = np.asarray(data, np.float64)
        self.in_dim = self.data.shape[1] - 1
        self.out_dim = 1
        self.data_splits = _kfold_indices(len(self.data), n_splits)

    def get_split(self, split: int = -1, train: bool = True
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """Standardised (x, y) arrays for one fold."""
        if split == -1:
            split = 0
        assert 0 <= split < self.n_splits
        tr_idx, te_idx = self.data_splits[split]
        x_tr = self.data[tr_idx, : self.in_dim]
        y_tr = self.data[tr_idx, self.in_dim:]
        x_te = self.data[te_idx, : self.in_dim]
        y_te = self.data[te_idx, self.in_dim:]
        x_m, x_s = x_tr.mean(0), x_tr.var(0) ** 0.5
        y_m, y_s = y_tr.mean(0), y_tr.var(0) ** 0.5
        x_s = np.where(x_s == 0, 1.0, x_s)
        y_s = np.where(y_s == 0, 1.0, y_s)
        if train:
            x, y = (x_tr - x_m) / x_s, (y_tr - y_m) / y_s
        else:
            x, y = (x_te - x_m) / x_s, (y_te - y_m) / y_s
        return x.astype(np.float32), y.astype(np.float32)
