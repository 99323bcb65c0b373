#!/usr/bin/env python
"""Visual smoke test: render samples from every loader to PNG for manual
inspection (reference: tests/plot_datasets.py:49-84).

Usage: python tests/plot_datasets.py [--out plots/]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="dataset_plots")
    p.add_argument("--data", default="./data")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from qbn_tpu.config import Config
    from qbn_tpu.data import get_train_loaders, get_test_loader

    os.makedirs(args.out, exist_ok=True)
    for dataset in ("mnist", "cifar"):
        cfg = Config(dataset=dataset, data=args.data, batch_size=8,
                     valid_portion=0.1)
        loaders = {}
        loaders["train"], loaders["valid"] = get_train_loaders(cfg)
        loaders["test"] = get_test_loader(cfg)
        loaders["ood"] = get_test_loader(cfg.replace(
            dataset="random_" + dataset))
        for split, loader in loaders.items():
            x, y = next(iter(loader))
            f, axes = plt.subplots(1, 5, figsize=(12, 3))
            for i, ax in enumerate(axes):
                img = x[i]
                img = (img - img.min()) / max(img.max() - img.min(), 1e-8)
                ax.imshow(img.squeeze(), cmap="gray" if img.shape[-1] == 1
                          else None)
                ax.set_title(f"y={y[i]}")
                ax.axis("off")
            path = os.path.join(args.out, f"{dataset}_{split}.png")
            f.savefig(path)
            plt.close(f)
            print("wrote", path)


if __name__ == "__main__":
    main()
