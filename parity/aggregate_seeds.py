#!/usr/bin/env python
"""Multi-seed parity aggregation: mean +/- std over seeds per stack.

Contextualises single-seed parity deltas against cross-seed trajectory
variance (the reference's own statistical harness is 3-seed mean/std
aggregation, /root/reference/experiments/average_results.py:73-105).

Usage:
  python parity/aggregate_seeds.py --cells \
      pointwise:float:REFDIR1,REFDIR2,...:OURSDIR1,OURSDIR2,... \
      ... --out docs/PARITY_HARD_SEEDS.md

Each REFDIR holds a results.pickle (reference schema), each OURSDIR a
results.json (qbn_tpu schema); dirs are given per-seed in order.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np

METRICS = ("error", "ece", "nll", "entropy")
SPLITS = ("test", "random")


def load_ref(exp_dir: str):
    with open(os.path.join(exp_dir, "results.pickle"), "rb") as fh:
        return pickle.load(fh)


def load_ours(exp_dir: str):
    with open(os.path.join(exp_dir, "results.json")) as fh:
        return json.load(fh)


def fmt_ms(vals):
    if not vals:
        return "—"
    m, s = float(np.mean(vals)), float(np.std(vals))
    return f"{m:.4f} ± {s:.4f}"


def main(argv=None):
    p = argparse.ArgumentParser("multi-seed parity aggregator")
    p.add_argument("--cells", nargs="+", required=True,
                   help="method:phase:ref_dir1,ref_dir2,...:ours_dir1,...")
    p.add_argument("--out", default="docs/PARITY_HARD_SEEDS.md")
    p.add_argument("--preamble", default="")
    args = p.parse_args(argv)

    rows = []
    worst = {}  # (metric,) -> (|delta-of-means|, pooled seed std)
    for cell in args.cells:
        method, phase, ref_dirs, ours_dirs = cell.split(":")
        refs = [load_ref(d) for d in ref_dirs.split(",")]
        ourss = [load_ours(d) for d in ours_dirs.split(",")]
        for split in SPLITS:
            for metric in METRICS:
                rv = [r.get(metric, {}).get(split) for r in refs]
                ov = [o.get(metric, {}).get(split) for o in ourss]
                rv = [v for v in rv if isinstance(v, (int, float))]
                ov = [v for v in ov if isinstance(v, (int, float))]
                if not rv or not ov:
                    continue
                dmean = float(np.mean(ov) - np.mean(rv))
                pooled = float(np.sqrt((np.var(rv) + np.var(ov)) / 2))
                rows.append(
                    f"| {method} | {phase} | {split} | {metric} "
                    f"| {fmt_ms(rv)} | {fmt_ms(ov)} | {dmean:+.4f} "
                    f"| {pooled:.4f} |")
                if metric in ("error", "ece") and len(rv) > 1:
                    k = (metric,)
                    prev = worst.get(k, (0.0, 0.0))
                    if abs(dmean) > prev[0]:
                        worst[k] = (abs(dmean), pooled)

    hdr = ["# Hard-task parity, multi-seed (mean ± std over seeds)", ""]
    if args.preamble:
        hdr += [args.preamble, ""]
    table = ["| method | phase | split | metric | reference (torch/CPU) "
             "| qbn_tpu | delta of means | pooled seed std |",
             "|---|---|---|---|---|---|---|---|"] + rows
    summary = [""]
    for (metric,), (d, s) in sorted(worst.items()):
        summary.append(
            f"- worst |delta-of-means {metric}| over clean/OOD cells: "
            f"**{d:.4f}** (pooled per-stack seed std at that cell "
            f"{s:.4f})")
    out = "\n".join(hdr + table + summary) + "\n"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write(out)
    print(out)


if __name__ == "__main__":
    main()
