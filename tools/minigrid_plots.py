#!/usr/bin/env python
"""Render the L5 presentation artifacts from a mini sweep grid:
candlestick grid, distortion grid, and bitwidth lines
(reference: experiments/presentation/plot_{candlesticks,continous}.py).

Usage:
  python tools/minigrid_plots.py --sweeps <dir> --tier mnist \
      --methods pointwise bbb --cells a_7_w_8 a_7_w_4 a_4_w_8 \
      --out examples/minigrid
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qbn_tpu.evaluation.presentation import (  # noqa: E402
    plot_candlestick_grid, plot_distortion_grid, plot_bitwidth_lines,
)


def load(path):
    with open(os.path.join(path, "results.json")) as fh:
        return json.load(fh)


def main(argv=None):
    p = argparse.ArgumentParser("mini grid plots")
    p.add_argument("--sweeps", required=True)
    p.add_argument("--tier", default="mnist")
    p.add_argument("--methods", nargs="+", default=["pointwise", "bbb"])
    p.add_argument("--cells", nargs="+",
                   default=["a_7_w_8", "a_7_w_4", "a_4_w_8"])
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    float_avg = {m: load(os.path.join(args.sweeps,
                                      f"{m}-{args.tier}-avg"))
                 for m in args.methods}
    quant_avg = {m: {c: load(os.path.join(
        args.sweeps, f"{m}-{args.tier}-{c}-avg")) for c in args.cells}
        for m in args.methods}

    for metric in ("error", "ece", "entropy", "nll"):
        plot_candlestick_grid(
            float_avg, metric,
            os.path.join(args.out, f"candlestick_float_{metric}.png"))
        plot_distortion_grid(
            float_avg, metric,
            os.path.join(args.out, f"distortion_float_{metric}.png"))
        plot_bitwidth_lines(
            float_avg, quant_avg, metric, "test",
            os.path.join(args.out, f"bitwidth_{metric}.png"),
            cells=args.cells)
    # candlesticks for one INT cell too (the published-figure format at
    # the reference's default precision)
    int_cell = {m: quant_avg[m][args.cells[0]] for m in args.methods}
    for metric in ("error", "ece"):
        plot_candlestick_grid(
            int_cell, metric,
            os.path.join(args.out,
                         f"candlestick_{args.cells[0]}_{metric}.png"))
    print("wrote plots to", args.out)


if __name__ == "__main__":
    main()
