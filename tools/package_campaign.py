#!/usr/bin/env python
"""Package the reference-budget campaign output into the repo.

Copies every run's small artifacts (results.json, config.json, log.log,
GIT_REVISION, scalars.jsonl, plots, DONE) and the aggregate/figure trees
into examples/campaign/, SKIPPING weight checkpoints except the flagship
INT8 cell's seed-1 checkpoint (kept so bench.py --trained and the serving
bench are reproducible from the repo).

Usage: python tools/package_campaign.py [--runs /root/campaign_runs]
       [--out examples/campaign]
"""

from __future__ import annotations

import argparse
import os
import shutil

KEEP = ("results.json", "config.json", "log.log", "GIT_REVISION",
        "scalars.jsonl", "DONE")
KEEP_EXT = (".png",)
FLAGSHIP_CKPT = "bbb-cifar-a_7_w_8-seed1"


def main(argv=None):
    p = argparse.ArgumentParser("campaign packager")
    p.add_argument("--runs", default="/root/campaign_runs")
    p.add_argument("--out", default="examples/campaign")
    p.add_argument("--done-only", action="store_true",
                   help="skip per-seed run dirs without a DONE marker "
                        "(safe to run while a queue is mid-cell); "
                        "-avg and figures trees are always copied")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    for name in sorted(os.listdir(args.runs)):
        src = os.path.join(args.runs, name)
        if name.startswith("."):
            continue
        dst = os.path.join(args.out, name)
        if not os.path.isdir(src):
            continue
        if (args.done_only and name != "figures"
                and not name.endswith("-avg")
                and not os.path.exists(os.path.join(src, "DONE"))):
            continue
        os.makedirs(dst, exist_ok=True)
        if name == "figures":
            shutil.copytree(src, dst, dirs_exist_ok=True)
            continue
        for f in sorted(os.listdir(src)):
            keep = (f in KEEP or f.endswith(KEEP_EXT)
                    or (name == FLAGSHIP_CKPT and f == "weights.msgpack"))
            if keep:
                shutil.copy2(os.path.join(src, f), os.path.join(dst, f))
    print(f"[package] campaign packaged into {args.out}")


if __name__ == "__main__":
    main()
