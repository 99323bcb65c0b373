#!/usr/bin/env python
"""Measure the torch-CPU reference-equivalent TRAINING step, the train-side
counterpart of BASELINE_MEASURED.json (which covers MC eval only).

Runs the UNMODIFIED reference stack (via the parity shims): its own
conv_resnet_bbb model (local-reparameterisation convs,
reference: src/models/stochastic/bbb/conv.py:24-33), its own ELBO criterion
(src/losses.py) and its own trainer step semantics
(src/trainer.py:87-135: zero_grad -> forward -> get_kl_divergence ->
criterion -> backward -> NaN-grad scrub -> Adam step) on CIFAR-shaped
random data at the reference budget's batch size.

Caveat recorded alongside the number: the reference campaign ran on a
2020-era NVIDIA GPU (BASELINE.md); no GPU exists on this host, so the CPU
number is the same eval-path-equivalent convention BASELINE_MEASURED.json
uses for the MC-eval baseline.

Writes BASELINE_TRAIN_MEASURED.json next to BASELINE_MEASURED.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

BATCH = 256
STEPS = 8


def main():
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from parity.torch_compat import install
    install(REFERENCE)
    import torch

    from src.losses import LOSS_FACTORY
    from src.models import ModelFactory

    args = SimpleNamespace(
        task="classification", gamma=0.01, sigma_prior=0.05,
        activation_precision=7, weight_precision=8, q=False, at=False,
        samples=1, loss_multiplier=1.0, batch_size=BATCH)
    torch.manual_seed(0)
    model = ModelFactory.get_model("conv_resnet_bbb", [1, 3, 32, 32], 10,
                                   False, args)
    model.train()
    criterion = LOSS_FACTORY["classification"](args, "batch")
    optimizer = torch.optim.Adam(model.parameters(), 1e-3)

    x = torch.rand(BATCH, 3, 32, 32)
    y = torch.randint(0, 10, (BATCH,))
    n_batches, n_points = 176, 45000  # CIFAR 45k train split @ 256

    def step():
        optimizer.zero_grad()
        out = model(x)
        kl = model.get_kl_divergence()
        obj, main_obj, kl = criterion(out, y, kl, args.gamma, n_batches,
                                      n_points)
        obj.backward()
        for p in model.parameters():
            if p.grad is not None:
                p.grad[p.grad != p.grad] = 0
        optimizer.step()
        return float(obj)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    dt = (time.perf_counter() - t0) / STEPS
    result = {
        "train_step_sec": dt,
        "train_examples_per_sec": BATCH / dt,
        "what": "torch-CPU reference BBB ResNet-18(w24) float train step "
                "(local-reparam forward + ELBO + backward + Adam), "
                "batch 256 CIFAR shapes; reference campaign hardware was "
                "a 2020-era GPU (unavailable here) - same CPU-equivalent "
                "convention as BASELINE_MEASURED.json",
        "batch": BATCH,
    }
    out = os.path.join(REPO, "BASELINE_TRAIN_MEASURED.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
