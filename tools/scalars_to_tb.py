#!/usr/bin/env python
"""Convert a qbn_tpu scalars.jsonl stream into TensorBoard event files.

The reference logs training scalars to TensorBoard directly
(reference: src/utils.py:195-196, src/metrics.py:305-313). qbn_tpu keeps
the hot path dependency-free by streaming JSONL (evaluation/writer.py)
and converts offline:

  python tools/scalars_to_tb.py <exp-dir>/scalars.jsonl [--out <dir>]

then `tensorboard --logdir <dir>` serves the same dashboards a reference
user would see. wall_time is preserved so relative-time views match the
original run.
"""

from __future__ import annotations

import argparse
import json
import os


def convert(jsonl_path: str, out_dir: str | None = None):
    """Returns (event_dir, n_records)."""
    from torch.utils.tensorboard import SummaryWriter

    out_dir = out_dir or os.path.join(
        os.path.dirname(os.path.abspath(jsonl_path)), "tb")
    writer = SummaryWriter(log_dir=out_dir)
    n = 0
    # packaged campaign trees gzip their big scalar streams
    # (tools/package_campaign.py --gzip-logs)
    opener = (lambda p: __import__("gzip").open(p, "rt")) \
        if jsonl_path.endswith(".gz") else open
    with opener(jsonl_path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            writer.add_scalar(rec["tag"], rec["value"],
                              global_step=rec["step"],
                              walltime=rec.get("wall_time"))
            n += 1
    writer.close()
    return out_dir, n


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("jsonl", help="path to scalars.jsonl")
    p.add_argument("--out", default=None,
                   help="event-file dir (default: <jsonl dir>/tb)")
    args = p.parse_args(argv)
    out_dir, n = convert(args.jsonl, args.out)
    print(f"wrote {n} scalars to {out_dir}")


if __name__ == "__main__":
    main()
