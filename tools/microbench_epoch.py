#!/usr/bin/env python
"""TPU end-to-end TRAIN EPOCH wall time: host per-batch loop vs the
device-resident epoch scan (training/trainer.py).

The per-step fori_loop bench (microbench_train.py) measures step compute
only; this measures what an experiment actually pays per epoch — through
the axon relay every host-loop batch costs an H2D upload + dispatch
(~100-200 ms RTT class), which the scan path collapses into ONE upload of
the raw dataset + ONE dispatch + ONE fetch per epoch
(reference wall-clock axis: src/trainer.py:127-132 train_time).

Run in the background and poll the log (CLAUDE.md TPU hazards).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from qbn_tpu.config import Config
from qbn_tpu.data import datasets as D
from qbn_tpu.data.loaders import ArrayLoader, augment_cifar
from qbn_tpu.models.factory import build_model
from qbn_tpu.training.optim import build_optimizer
from qbn_tpu.training.trainer import Trainer
from qbn_tpu.utils import init_variables

B = 256
N_BATCHES = int(os.environ.get("QBN_EPOCH_BATCHES", "32"))


def build(scan: bool):
    os.environ["QBN_EPOCH_SCAN"] = "on" if scan else "off"
    cfg = Config(model="conv_resnet_bbb", dataset="cifar",
                 task="classification", input_size=(32, 32, 3),
                 output_size=10, batch_size=B, sigma_prior=0.05,
                 gamma=0.01, learning_rate=1e-3, optimizer="adam",
                 lr_schedule="constant", seed=3)
    rng = np.random.RandomState(0)
    xt = rng.rand(N_BATCHES * B, 32, 32, 3).astype(np.float32)
    yt = rng.randint(0, 10, N_BATCHES * B).astype(np.int64)
    norm = lambda a: D.normalize(a, "cifar")                  # noqa: E731
    train = ArrayLoader(xt, yt, B, shuffle=True, seed=3,
                        augment=augment_cifar, normalize=norm)
    train.normalize_kind = "cifar"
    model = build_model(cfg)
    tx, _ = build_optimizer(cfg, len(train))
    trainer = Trainer(model, cfg, tx, mode="float", train_loader=train)
    variables = init_variables(model, jax.random.PRNGKey(2), xt[:B])
    state = trainer.init_state(variables, jax.random.PRNGKey(cfg.seed))
    return trainer, state


def bench(scan: bool):
    trainer, state = build(scan)
    # warm epoch: compiles + (scan path) uploads the dataset
    t0 = time.perf_counter()
    state, _ = trainer.train_epoch(state)
    np.asarray(state.step)
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, _ = trainer.train_epoch(state)
        np.asarray(state.step)   # force a real fetch through the relay
        ts.append(time.perf_counter() - t0)
    return warm, min(ts)


def main():
    print("devices:", jax.devices(), flush=True)
    print(f"epoch = {N_BATCHES} batches x {B}", flush=True)
    for scan in (False, True):
        warm, dt = bench(scan)
        label = "scan" if scan else "host-loop"
        print(f"{label:9s} warm {warm:6.1f} s   epoch {dt*1e3:8.1f} ms   "
              f"{N_BATCHES*B/dt:,.0f} examples/s   "
              f"{dt*1e3/N_BATCHES:6.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
