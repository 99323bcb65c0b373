#!/usr/bin/env python
"""Rebuild every `-avg` aggregate in a sweep output tree from the seed
dirs that actually completed (have a DONE marker).

The sweep driver re-aggregates after each cell, but a single-seed resume
call aggregates over ONE seed, and a wall-clock cutoff can leave a cell
with 1-2 completed seeds and a stale 3-seed aggregate (or none). This
tool makes the aggregates consistent with whatever is on disk — CPU-only,
no JAX, safe to run while a TPU job holds the device.

Usage: python tools/reaggregate.py /root/campaign_runs
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments import average_results  # noqa: E402

_SEED_RE = re.compile(r"^(.*)-seed(\d+)$")


def main(argv=None):
    p = argparse.ArgumentParser("sweep aggregate rebuilder")
    p.add_argument("out", help="sweep output tree (e.g. /root/campaign_runs)")
    args = p.parse_args(argv)

    groups: dict[str, list[str]] = {}
    for name in sorted(os.listdir(args.out)):
        m = _SEED_RE.match(name)
        if not m:
            continue
        d = os.path.join(args.out, name)
        if os.path.isdir(d) and os.path.exists(os.path.join(d, "DONE")):
            groups.setdefault(m.group(1), []).append(d)

    for prefix, dirs in sorted(groups.items()):
        save = os.path.join(args.out, f"{prefix}-avg")
        average_results.main(dirs + ["--save", save])
        print(f"[reaggregate] {prefix}-avg <- {len(dirs)} seeds")


if __name__ == "__main__":
    main()
