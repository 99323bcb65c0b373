#!/usr/bin/env python
"""TPU wall time of the 3x5 distortion sweep: per-cell loader path
(host distortion + full test-set upload per cell, whole-split eval scan)
vs the device-resident sweep (clean test set uploaded once, every cell
generated on device — evaluation/mc.py:evaluate_distortion_sweep).

This measures what an experiment's eval phase actually pays per cell
through the axon relay (reference sweep: experiments/utils.py:83-131).
Run in the background and poll the log (CLAUDE.md TPU hazards).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from bench_suite import build_int8                      # noqa: E402

SAMPLES = int(os.environ.get("QBN_SWEEP_SAMPLES", "20"))
BATCH = 256


def loader_path(model, variables, cfg):
    from qbn_tpu.data.loaders import get_test_loader
    from qbn_tpu.evaluation.mc import evaluate_with_loader
    from qbn_tpu.data.distortions import DISTORTIONS, LEVELS
    out = []
    for distortion in DISTORTIONS:
        for level in range(LEVELS):
            loader = get_test_loader(cfg, distortion, level)
            r = evaluate_with_loader(loader, model, variables, cfg, "int",
                                     collect_outputs=False,
                                     salt=f"{distortion}{level}")
            out.append((distortion, level) + r[:4])
    return out


def device_path(model, variables, cfg):
    from qbn_tpu.evaluation.mc import evaluate_distortion_sweep
    return evaluate_distortion_sweep(model, variables, cfg, "int")


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    cfg, model, variables, _ = build_int8("conv_resnet_bbb", "cifar",
                                          BATCH, SAMPLES)
    cfg = cfg.replace(data="./data", seed=1)
    for name, fn in (("loader-path", loader_path),
                     ("device-resident", device_path)):
        t0 = time.perf_counter()
        res = fn(model, variables, cfg)          # incl. compile for cell 1
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = fn(model, variables, cfg)
        dt = time.perf_counter() - t0
        assert res is not None and len(res) == 15
        err = np.array([r[2] for r in res])
        print(f"{name:16s} warm {warm:6.1f} s   sweep {dt:6.1f} s "
              f"({dt/15*1e3:7.0f} ms/cell)   mean err {err.mean():.4f}",
              flush=True)


if __name__ == "__main__":
    main()
