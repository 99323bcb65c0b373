#!/usr/bin/env python
"""Visual smoke test: one image per distortion x severity level
(reference: tests/plot_distortions.py:38-64).

Usage: python tests/plot_distortions.py [--out plots/]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="distortion_plots")
    p.add_argument("--data", default="./data")
    p.add_argument("--dataset", default="mnist")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from qbn_tpu.data.datasets import load_images
    from qbn_tpu.data.distortions import DISTORTIONS, LEVELS, \
        apply_distortion

    os.makedirs(args.out, exist_ok=True)
    x, y = load_images(args.dataset, args.data, train=False)
    img = x[:1]

    f, axes = plt.subplots(len(DISTORTIONS), LEVELS,
                           figsize=(2.2 * LEVELS, 2.2 * len(DISTORTIONS)))
    for r, distortion in enumerate(DISTORTIONS):
        for level in range(LEVELS):
            out = apply_distortion(img, distortion, level)[0]
            ax = axes[r][level]
            ax.imshow(out.squeeze(), cmap="gray" if out.shape[-1] == 1
                      else None, vmin=0, vmax=1)
            ax.set_title(f"{distortion} L{level + 1}", fontsize=8)
            ax.axis("off")
    path = os.path.join(args.out, f"{args.dataset}_distortions.png")
    f.tight_layout()
    f.savefig(path)
    print("wrote", path)


if __name__ == "__main__":
    main()
