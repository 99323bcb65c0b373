"""Lockstep training parity vs the UNMODIFIED torch reference: the two
stacks train the pointwise LeNet from identical weights on identical
batches and must produce near-identical per-step losses (the step-level
proof that Adam + cosine schedule + coupled weight decay + 'batch' loss
scaling match torch semantics exactly; see parity/train_lockstep.py and
docs/PARITY_HARD.md). Skipped when the reference checkout or torch is
absent."""

import os

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference checkout not available")


def test_lockstep_losses_match_torch():
    torch = pytest.importorskip("torch")
    del torch
    from parity.train_lockstep import run_lockstep

    rng = np.random.RandomState(0)
    # small synthetic images, 2 full batches x 3 epochs = 6 steps: early
    # enough that cross-framework ULP chaos has not amplified
    x = rng.rand(64, 28, 28, 1).astype(np.float32)
    y = rng.randint(0, 10, 64).astype(np.int64)
    worst, _ = run_lockstep(x, y, steps=6, batch=32, epochs=3,
                            verbose=False)
    assert worst < 1e-3, worst
