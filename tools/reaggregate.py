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
    p.add_argument("--prune-orphans", action="store_true",
                   help="delete -avg dirs whose prefix has no DONE seed "
                        "dirs (default: warn only)")
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

    # Orphaned aggregates: an -avg dir whose prefix has NO completed seed
    # dirs can only be a stale copy (e.g. a committed aggregate seeded into
    # a fresh tree while its seed dirs were excluded) — figures consuming
    # it would report numbers no on-disk seed backs. Warn loudly; delete
    # with --prune-orphans.
    for name in sorted(os.listdir(args.out)):
        if not name.endswith("-avg"):
            continue
        prefix = name[: -len("-avg")]
        if prefix in groups:
            continue
        d = os.path.join(args.out, name)
        if not os.path.isdir(d):
            continue
        if args.prune_orphans:
            import shutil
            shutil.rmtree(d)
            print(f"[reaggregate] PRUNED orphan {name} (no DONE seeds)")
        else:
            print(f"[reaggregate] WARNING: {name} has no DONE seed dirs "
                  f"(stale aggregate; --prune-orphans to remove)")


if __name__ == "__main__":
    main()
