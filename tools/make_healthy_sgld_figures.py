#!/usr/bin/env python
"""Render the MNIST figure variant with the diverged SGHMC chain excluded.

sgld-mnist seed 3's chain diverged at epoch 90/100 (documented in
examples/campaign/README.md): snapshots past the jump dominate the
7-member ensemble, so the committed 3-seed `-avg` trees put the sgld row
far off the other methods for a reason that is one bad chain, not method
physics. The reference's own runs carry divergence defenses instead
(reference: src/trainer.py:103-117 NaN/inf step rejection).

This tool builds a SHADOW sweep root where every `-avg` dir is the
committed one except the sgld-mnist groups, which are re-averaged over
the healthy seeds only, then renders the standard figure set from it.
The primary 3-seed figures stay untouched — both variants ship, and the
README states which is which (VERDICT r4 item 4).

Usage:
  python tools/make_healthy_sgld_figures.py examples/campaign \
      --out examples/campaign/figures/mnist_healthy_sgld \
      [--exclude sgld-mnist:3]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from experiments.average_results import aggregate  # noqa: E402
from qbn_tpu.evaluation.results import results_path  # noqa: E402
import tools.make_grid_plots as make_grid_plots  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser("healthy-seed sgld figure variant")
    p.add_argument("root", help="campaign tree (e.g. examples/campaign)")
    p.add_argument("--out", required=True)
    p.add_argument("--dataset", default="mnist")
    p.add_argument("--exclude", default="sgld-mnist:3",
                   help="<method>-<dataset>:<seed>[,...] runs to drop")
    args = p.parse_args(argv)

    excluded = {}
    for spec in args.exclude.split(","):
        prefix, seed = spec.rsplit(":", 1)
        excluded.setdefault(prefix, set()).add(int(seed))

    shadow = tempfile.mkdtemp(prefix="qbn_healthy_")
    reavg = []
    for name in sorted(os.listdir(args.root)):
        src = os.path.join(args.root, name)
        if not (os.path.isdir(src) and name.endswith("-avg")):
            continue
        group = name[:-len("-avg")]
        # group is <method>-<dataset>[-<cell>]; match the excluded prefix
        hit = next((pfx for pfx in excluded
                    if group == pfx or (group.startswith(pfx + "-")
                                        and f"-{args.dataset}-" in group)),
                   None)
        if hit is None:
            os.symlink(os.path.abspath(src), os.path.join(shadow, name))
            continue
        trees = []
        kept = []
        for m in sorted(os.listdir(args.root)):
            sm = re.fullmatch(re.escape(group) + r"-seed(\d+)", m)
            if not sm or int(sm.group(1)) in excluded[hit]:
                continue
            with open(results_path(os.path.join(args.root, m))) as fh:
                trees.append(json.load(fh))
            kept.append(int(sm.group(1)))
        if not trees:
            raise SystemExit(f"no healthy seeds found for {group}")
        summary = aggregate(trees)
        summary["n_runs"] = len(trees)
        summary["seeds"] = sorted(kept)
        dst = os.path.join(shadow, name)
        os.makedirs(dst)
        with open(results_path(dst), "w") as fh:
            json.dump(summary, fh, indent=2)
        reavg.append((group, sorted(kept)))

    for group, kept in reavg:
        print(f"re-averaged {group}-avg over seeds {kept}")
    make_grid_plots.main([shadow, "--dataset", args.dataset,
                          "--out", args.out])


if __name__ == "__main__":
    main()
