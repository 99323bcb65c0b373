#!/usr/bin/env python
"""Lockstep training-parity probe: the UNMODIFIED torch reference LeNet
and qbn_tpu's LeNet trained from IDENTICAL initial weights on IDENTICAL
fixed batches (no shuffle), same Adam/cosine/wd hyperparameters. Prints
per-step (loss_ref, loss_ours, delta) — a systematic divergence here
isolates a training-semantics mismatch; agreement pushes the hard-task
parity gap to the data/eval layer.

Usage:
  python parity/train_lockstep.py --data /tmp/parity/data_hard \
      --steps 40 --batch 256
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def torch_lenet(args_ns):
    sys.path.insert(0, REFERENCE)
    from src.models import ModelFactory
    return ModelFactory.get_model("conv_lenet", [1, 1, 28, 28], 10,
                                  False, args_ns)


def run_lockstep(x, y, steps, batch, epochs, xtest=None, ytest=None,
                 verbose=True, optimizer="adam", burnin_epochs=2,
                 resample_momentum_iterations=50,
                 resample_prior_iterations=15):
    """Train both stacks in lockstep on (x, y); returns
    (worst |delta loss| over steps, per-stack endpoint (train, test)
    error dicts — test entries only when xtest is given).

    optimizer='adam' (default) mirrors the float flows (Adam + cosine +
    coupled wd + 'batch' scaling). optimizer='sghmc' drives the
    reference's own SGLD optimizer (utils_sgld.py) against our sghmc
    transform with 'whole' scaling and constant lr, with BOTH stacks'
    stochastic draws pinned to their means (normals -> 0, Gamma -> its
    mean a*scale) so every deterministic term of the update law —
    weight-decay gradient assembly, burn-in tau/g/V_hat adaptation,
    V^-1/2 preconditioning, friction, prior-precision resampling —
    is compared step by step on real data."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from parity.torch_compat import install
    install(REFERENCE)
    import torch

    spe = len(x) // batch
    if verbose:
        print(f"[lockstep] {len(x)} examples, {spe} steps/epoch")

    # ---- reference model + optimizer (its own classes, untouched)
    from types import SimpleNamespace
    tns = SimpleNamespace(task="classification", gamma=0.0,
                          activation_precision=7, weight_precision=8,
                          q=False, at=False, samples=1,
                          loss_multiplier=1.0)
    torch.manual_seed(1)
    tmodel = torch_lenet(tns)
    from src.losses import LOSS_FACTORY
    tsched = None
    if optimizer == "sghmc":
        import src.models.stochastic.sgld.utils_sgld as usgld
        # pin the stochastic terms to their means (shim, both stacks)
        usgld.gamma = lambda shape, scale, size=None: shape * scale
        torch.normal = lambda mean, std: torch.zeros_like(mean)
        tcrit = LOSS_FACTORY["classification"](tns, "whole")
        topt = usgld.SGLD(tmodel.parameters(), lr=1e-2, base_C=0.05,
                          gauss_sig=0.1)
    else:
        tcrit = LOSS_FACTORY["classification"](tns, "batch")
        topt = torch.optim.Adam(tmodel.parameters(), 1e-3,
                                weight_decay=1e-4)
        tsched = torch.optim.lr_scheduler.CosineAnnealingLR(topt, epochs)

    # ---- our model from the SAME initial weights
    from qbn_tpu.config import Config
    from qbn_tpu.models.factory import build_model
    from qbn_tpu.training.optim import build_optimizer
    from qbn_tpu.training.trainer import Trainer, make_train_step
    from qbn_tpu.training.trainer import _metrics_init
    from qbn_tpu.utils import init_variables

    if optimizer == "sghmc":
        cfg = Config(model="conv_lenet", task="classification",
                     dataset="mnist", output_size=10, batch_size=batch,
                     learning_rate=1e-2, weight_decay=0.0,
                     optimizer="sghmc", lr_schedule="constant",
                     loss_scaling="whole", epochs=epochs, gamma=0.0,
                     burnin_epochs=burnin_epochs,
                     resample_momentum_iterations=(
                         resample_momentum_iterations),
                     resample_prior_iterations=resample_prior_iterations,
                     seed=1, input_size=(28, 28, 1))
    else:
        cfg = Config(model="conv_lenet", task="classification",
                     dataset="mnist", output_size=10, batch_size=batch,
                     learning_rate=1e-3, weight_decay=1e-4,
                     optimizer="adam", lr_schedule="cosine", epochs=epochs,
                     gamma=0.0, seed=1, input_size=(28, 28, 1))
    model = build_model(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0),
                               x[:batch])
    params = variables["params"]

    tw = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    print("[lockstep] torch params:",
          {k: v.shape for k, v in tw.items()})

    def put(tree, path, arr):
        node = tree
        for k in path[:-1]:
            node = node[k]
        assert node[path[-1]].shape == arr.shape, \
            (path, node[path[-1]].shape, arr.shape)
        node[path[-1]] = jnp.asarray(arr)

    params = jax.tree.map(np.asarray, params)  # mutable copy (dicts)
    import flax
    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") \
        else params
    c0 = tw["layers.0.weight"].transpose(2, 3, 1, 0)          # HWIO
    c1 = tw["layers.2.weight"].transpose(2, 3, 1, 0)
    f0 = tw["layers.5.weight"].reshape(500, 50, 7, 7) \
        .transpose(2, 3, 1, 0).reshape(2450, 500)             # (hwc, out)
    f1 = tw["layers.7.weight"].T
    put(params, ("conv_0", "kernel"), c0)
    put(params, ("conv_1", "kernel"), c1)
    put(params, ("fc_0", "kernel"), f0)
    put(params, ("fc_1", "kernel"), f1)

    restore_jr = None
    if optimizer == "sghmc":
        # pin our stochastic terms to their means too (trace-time patch;
        # the pointwise float forward draws no other normals)
        _orig_normal, _orig_gamma = jax.random.normal, jax.random.gamma
        jax.random.normal = (
            lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape,
                                                              dtype))
        jax.random.gamma = (
            lambda key, a, shape=None, dtype=jnp.float32:
            jnp.asarray(a, jnp.float32))
        restore_jr = (_orig_normal, _orig_gamma)

    tx, _ = build_optimizer(cfg, spe)
    n_batches, n_points = spe, len(x)
    step_fn = make_train_step(model, cfg, tx, "float", n_batches, n_points)
    trainer = None  # unused; step_fn is the whole loop
    from qbn_tpu.training.trainer import TrainState
    state = TrainState(
        params=params,
        model_state={k: v for k, v in variables.items() if k != "params"},
        opt_state=tx.init(params), step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(2))

    tmodel.train()
    worst = 0.0
    for s in range(steps):
        e, b = divmod(s, spe)
        if b == 0 and e >= 1 and tsched is not None:
            tsched.step()
        xb = x[b * batch:(b + 1) * batch]
        yb = y[b * batch:(b + 1) * batch]

        # torch step (mirrors reference trainer._step)
        ti = torch.from_numpy(xb.transpose(0, 3, 1, 2))
        tt = torch.from_numpy(yb)
        topt.zero_grad()
        tout = tmodel(ti)
        tobj, _, _ = tcrit(tout, tt, torch.zeros(1), 0.0,
                           n_batches, n_points)
        tobj.backward()
        if optimizer == "sghmc":
            topt.step(
                burn_in=(e < burnin_epochs),
                resample_momentum=(
                    s % resample_momentum_iterations == 0),
                resample_prior=(s % resample_prior_iterations == 0))
        else:
            topt.step()

        # ours
        ms = _metrics_init(cfg.task)
        state, ms, logs = step_fn(state, ms, jnp.asarray(xb),
                                  jnp.asarray(yb))
        lo = float(logs["obj"])
        lt = float(tobj.detach())
        worst = max(worst, abs(lo - lt))
        if verbose:
            print(f"step {s:3d} (ep {e:2d}) ref {lt:.6f} ours {lo:.6f} "
                  f"d {lo - lt:+.2e}")
    if verbose:
        print(f"[lockstep] worst |delta loss| over {steps} steps: "
              f"{worst:.3e}")
    if restore_jr is not None:
        jax.random.normal, jax.random.gamma = restore_jr

    # ---- endpoint comparison: where does each stack LAND?
    def t_err(xa, ya):
        tmodel.eval()
        errs = 0
        with torch.no_grad():
            for i in range(0, len(xa), 500):
                o = tmodel(torch.from_numpy(
                    xa[i:i+500].transpose(0, 3, 1, 2)))
                errs += int((o.argmax(1).numpy() != ya[i:i+500]).sum())
        tmodel.train()
        return errs / len(xa)

    def o_err(xa, ya):
        errs = 0
        for i in range(0, len(xa), 500):
            out = model.apply(
                {"params": state.params, **state.model_state},
                jnp.asarray(xa[i:i+500]), train=False, mode="float")
            errs += int((np.asarray(out).argmax(1) != ya[i:i+500]).sum())
        return errs / len(xa)

    ends = {"ref": {"train": t_err(x, y)}, "ours": {"train": o_err(x, y)}}
    if xtest is not None:
        ends["ref"]["test"] = t_err(xtest, ytest)
        ends["ours"]["test"] = o_err(xtest, ytest)
    if verbose:
        print(f"[lockstep] endpoint train err: ref "
              f"{ends['ref']['train']:.4f} ours {ends['ours']['train']:.4f}")
        if xtest is not None:
            print(f"[lockstep] endpoint test  err: ref "
                  f"{ends['ref']['test']:.4f} ours "
                  f"{ends['ours']['test']:.4f}")
    return worst, ends


def main(argv=None):
    p = argparse.ArgumentParser("lockstep parity probe")
    p.add_argument("--data", required=True)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--epochs", type=int, default=20,
                   help="cosine T_max; steps beyond epochs*spe clamp")
    p.add_argument("--n", type=int, default=512, help="examples used")
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "sghmc"])
    args = p.parse_args(argv)
    from qbn_tpu.data.datasets import _read_idx_images, _read_idx_labels
    xs = _read_idx_images(os.path.join(
        args.data, "MNIST", "raw", "train-images-idx3-ubyte"))
    ys = _read_idx_labels(os.path.join(
        args.data, "MNIST", "raw", "train-labels-idx1-ubyte"))
    xt = _read_idx_images(os.path.join(
        args.data, "MNIST", "raw", "t10k-images-idx3-ubyte"))
    yt = _read_idx_labels(os.path.join(
        args.data, "MNIST", "raw", "t10k-labels-idx1-ubyte"))
    run_lockstep(xs[:args.n].astype(np.float32) / 255.0,
                 ys[:args.n].astype(np.int64),
                 args.steps, args.batch, args.epochs,
                 xt.astype(np.float32) / 255.0, yt.astype(np.int64),
                 optimizer=args.optimizer)


if __name__ == "__main__":
    main()
