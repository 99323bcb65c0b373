#!/usr/bin/env python
"""Build the accuracy-parity table (docs/PARITY.md) from reference
results.pickle files and qbn_tpu results.json files.

Usage:
  python parity/compare.py --pairs \
      pointwise:float:<ref-exp-dir>:<ours-exp-dir> \
      bbb:qat:<ref-exp-dir>:<ours-exp-dir> ... \
      --out docs/PARITY.md
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

METRICS = ("error", "ece", "nll", "entropy")
SPLITS = ("test", "random")


def load_ref(exp_dir: str):
    with open(os.path.join(exp_dir, "results.pickle"), "rb") as fh:
        return pickle.load(fh)


def load_ours(exp_dir: str):
    with open(os.path.join(exp_dir, "results.json")) as fh:
        return json.load(fh)


def fmt(v):
    return f"{v:.4f}" if isinstance(v, (int, float)) else "—"


def main(argv=None):
    p = argparse.ArgumentParser("parity table builder")
    p.add_argument("--pairs", nargs="+", required=True,
                   help="method:phase:ref_dir:ours_dir")
    p.add_argument("--out", default="docs/PARITY.md")
    p.add_argument("--preamble", default="")
    args = p.parse_args(argv)

    lines = []
    dlines = []
    worst = {}
    for pair in args.pairs:
        method, phase, ref_dir, ours_dir = pair.split(":")
        ref, ours = load_ref(ref_dir), load_ours(ours_dir)
        is_regression = ref.get("error", {}).get("test") is None
        for split in SPLITS if not is_regression else ():
            for metric in METRICS:
                rv = ref.get(metric, {}).get(split)
                ov = ours.get(metric, {}).get(split)
                delta = (ov - rv) if isinstance(rv, (int, float)) and \
                    isinstance(ov, (int, float)) else None
                lines.append(
                    f"| {method} | {phase} | {split} | {metric} "
                    f"| {fmt(rv)} | {fmt(ov)} "
                    f"| {fmt(delta) if delta is not None else '—'} |")
                if delta is not None and metric in ("error", "ece"):
                    key = (metric,)
                    worst[key] = max(worst.get(key, 0.0), abs(delta))
        for ds in sorted(k for k in ref.get("error", {})
                         if isinstance(k, str)
                         and k.startswith("regression_")):
            # regression tier: per-dataset RMSE ('error') + NLL over
            # train/valid/test (reference schema:
            # experiments/utils.py:203-218)
            for split in ("train", "valid", "test"):
                for metric in ("error", "nll"):
                    rv = ref.get(metric, {}).get(ds, {}).get(split)
                    ov = ours.get(metric, {}).get(ds, {}).get(split)
                    if rv is None or ov is None:
                        continue
                    label = ("rmse" if metric == "error" else metric)
                    lines.append(
                        f"| {method} | {phase} | {ds[11:]} {split} "
                        f"| {label} | {fmt(rv)} | {fmt(ov)} "
                        f"| {fmt(ov - rv)} |")
        for distortion in ("rotation", "shift", "brightness"):
            for lvl in "01234":
                for metric in ("error", "ece"):
                    rv = ref.get(metric, {}).get(distortion, {}).get(lvl)
                    ov = ours.get(metric, {}).get(distortion, {}).get(lvl)
                    if rv is None or ov is None:
                        continue
                    dlines.append(
                        f"| {method} | {phase} | {distortion} L{int(lvl)+1}"
                        f" | {metric} | {fmt(rv)} | {fmt(ov)} "
                        f"| {fmt(ov - rv)} |")

    header_row = ["| method | phase | split | metric "
                  "| reference (torch/CPU) | qbn_tpu "
                  "| delta (ours − ref) |",
                  "|---|---|---|---|---|---|---|"]
    table = header_row + lines

    hdr = ["# Accuracy/ECE parity: qbn_tpu vs the torch reference", ""]
    if args.preamble:
        hdr += [args.preamble, ""]
    summary = []
    for (metric,), v in sorted(worst.items()):
        summary.append(f"- worst |delta {metric}| over all clean/OOD "
                       f"cells: **{v:.4f}**")
    dist_hdr = [
        "", "## Distortion-shifted cells", "",
        "Same distortion FAMILIES but independent implementations "
        "(reference: PIL-shim transforms; qbn_tpu: numpy distortions), so "
        "the inputs are not byte-identical — these rows show both stacks "
        "degrade comparably, not an apples-to-apples model comparison.", ""]
    out = "\n".join(hdr + table + [""] + summary
                    + dist_hdr + header_row + dlines) + "\n"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write(out)
    print(out)


if __name__ == "__main__":
    main()
