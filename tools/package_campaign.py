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
import gzip
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
    p.add_argument("--gzip-logs", type=float, default=None, metavar="MB",
                   help="gzip log.log / scalars.jsonl copies larger than "
                        "this many MB (regression seeds stream ~26 MB of "
                        "per-fold epoch scalars; tools/scalars_to_tb.py "
                        "reads .gz transparently)")
    p.add_argument("--keep-ckpts", nargs="*", default=[],
                   help="run-dir name prefixes whose weights*.msgpack "
                        "checkpoints are ALSO copied (e.g. "
                        "'pointwise-cifar-seed' keeps the float ckpts a "
                        "future session needs to extend the quant grid "
                        "without re-running 300-epoch floats — the "
                        "container scratch dirs do not survive sessions)")
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
                    or (name == FLAGSHIP_CKPT and f == "weights.msgpack")
                    or (f.startswith("weights") and f.endswith(".msgpack")
                        and any(name.startswith(pfx)
                                for pfx in args.keep_ckpts)))
            if not keep:
                continue
            s = os.path.join(src, f)
            if (args.gzip_logs is not None
                    and f in ("log.log", "scalars.jsonl")
                    and os.path.getsize(s) > args.gzip_logs * 1e6):
                # mtime=0: deterministic bytes, so re-packaging an
                # unchanged log is a git no-op instead of header churn
                with open(s, "rb") as fin, \
                        open(os.path.join(dst, f + ".gz"), "wb") as raw, \
                        gzip.GzipFile(filename="", mode="wb",
                                      fileobj=raw, mtime=0) as fout:
                    shutil.copyfileobj(fin, fout)
                # drop a stale uncompressed copy from an earlier package run
                if os.path.exists(os.path.join(dst, f)):
                    os.remove(os.path.join(dst, f))
            else:
                shutil.copy2(s, os.path.join(dst, f))
                # mirror the gzip branch's stale-copy cleanup: a .gz left
                # by an earlier --gzip-logs run would shadow this fresh
                # plain copy for .gz-aware readers (TB export)
                if os.path.exists(os.path.join(dst, f + ".gz")):
                    os.remove(os.path.join(dst, f + ".gz"))
    print(f"[package] campaign packaged into {args.out}")


if __name__ == "__main__":
    main()
