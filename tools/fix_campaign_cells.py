#!/usr/bin/env python
"""Reconcile campaign cell dirs polluted by overlapping drivers.

During the round-3 campaign resume, a surviving driver from an
interrupted session (its stage process had been blocked on the exclusive
TPU tunnel) interleaved with the relaunched one: some cells ran twice
(both runs complete and identical in config — same seed, same budgets),
and because `setup_experiment` nests a timestamped subdir when --save
already exists, the second run's artifacts landed one level down.

Reconciliation per seed-cell dir:
  * top-level DONE present  -> the flat artifacts are a complete run;
    nested qat-*/not_q-* subdirs are redundant duplicate runs: deleted.
  * no top-level DONE, a nested run with DONE -> promote the newest
    complete nested run's artifacts to the top level (replacing any
    stale files from a crashed attempt), delete nested dirs.
  * neither -> the cell is incomplete; left untouched (the sweep's
    resume will rerun it cleanly — sweep.py clears un-DONE dirs now).

Afterwards every -avg dir is recomputed from its seed dirs.

Usage: python tools/fix_campaign_cells.py [--runs /root/campaign_runs]
       [--dry]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NESTED = re.compile(r"^(qat|not_q|q|not_qat)-.+-\d{8}-\d{6}$")


def nested_runs(d):
    out = []
    for f in sorted(os.listdir(d)):
        p = os.path.join(d, f)
        if os.path.isdir(p) and NESTED.match(f):
            out.append(p)
    return out


def promote(src, dst):
    for f in os.listdir(src):
        sp = os.path.join(src, f)
        dp = os.path.join(dst, f)
        if os.path.isfile(sp):
            shutil.copy2(sp, dp)


def main(argv=None):
    p = argparse.ArgumentParser("campaign cell fixup")
    p.add_argument("--runs", default="/root/campaign_runs")
    p.add_argument("--dry", action="store_true")
    args = p.parse_args(argv)

    cells = []
    for name in sorted(os.listdir(args.runs)):
        d = os.path.join(args.runs, name)
        if not os.path.isdir(d) or name in ("figures",) \
                or name.endswith("-avg"):
            continue
        cells.append((name, d))

    for name, d in cells:
        nests = nested_runs(d)
        if not nests:
            continue
        has_done = os.path.exists(os.path.join(d, "DONE"))
        complete = [n for n in nests
                    if os.path.exists(os.path.join(n, "DONE"))]
        if has_done:
            print(f"[fix] {name}: flat run complete; "
                  f"dropping {len(nests)} duplicate nested run(s)")
            if not args.dry:
                for n in nests:
                    shutil.rmtree(n)
        elif complete:
            newest = complete[-1]
            print(f"[fix] {name}: promoting {os.path.basename(newest)} "
                  f"over stale flat artifacts")
            if not args.dry:
                promote(newest, d)
                for n in nests:
                    shutil.rmtree(n)
        else:
            print(f"[fix] {name}: incomplete (no DONE anywhere) — "
                  f"left for the sweep resume")

    # recompute every aggregate from its (now authoritative) seed dirs
    from experiments import average_results
    groups = {}
    for name, d in cells:
        m = re.match(r"^(.+)-seed(\d+)$", name)
        if not m:
            continue
        groups.setdefault(m.group(1), []).append(d)
    for base, seeds in sorted(groups.items()):
        seeds = sorted(seeds)
        if not all(os.path.exists(os.path.join(s, "DONE"))
                   for s in seeds):
            print(f"[avg] {base}: seeds incomplete, skipped")
            continue
        if args.dry:
            print(f"[avg] {base}: would recompute from {len(seeds)} seeds")
            continue
        average_results.main(
            seeds + ["--save", os.path.join(args.runs, f"{base}-avg")])
        print(f"[avg] {base}: recomputed from {len(seeds)} seeds")


if __name__ == "__main__":
    main()
