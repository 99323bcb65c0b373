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


def test_lockstep_sghmc_matches_torch():
    """SGHMC update-law parity against the reference's own SGLD
    optimiser, stochastic terms pinned to their means in both stacks
    (normals -> 0, Gamma -> mean): weight-decay gradient assembly,
    burn-in tau/g/V_hat adaptation, V^-1/2 preconditioning, friction
    and prior-precision resampling compared step by step. Losses are
    'whole'-scaled (~n_points * nll), so the threshold is relative."""
    torch = pytest.importorskip("torch")
    del torch
    from parity.train_lockstep import run_lockstep

    rng = np.random.RandomState(1)
    x = rng.rand(64, 28, 28, 1).astype(np.float32)
    y = rng.randint(0, 10, 64).astype(np.int64)
    # 2 steps/epoch x 4 epochs: covers burn-in (epochs 0-1: adaptation +
    # prior/momentum resample at steps 0,3,6) AND post-burn-in frozen
    # preconditioner steps
    worst, _ = run_lockstep(x, y, steps=8, batch=32, epochs=4,
                            verbose=False, optimizer="sghmc",
                            burnin_epochs=2,
                            resample_momentum_iterations=3,
                            resample_prior_iterations=3)
    # 'whole' losses run 147 -> 1105 over these 8 steps (the lr=1e-2
    # post-burn-in dynamics genuinely explode — in BOTH stacks, to
    # matching values): steps 0-5 agree to ~1e-5 absolute and the stiff
    # steps amplify ULP noise, so bound the worst step at 0.1 absolute
    # (~7e-4 relative)
    assert worst < 0.1, worst
