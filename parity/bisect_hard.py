#!/usr/bin/env python
"""Bisect the hard-task systematic parity offset (pointwise cells).

docs/PARITY_HARD_SEEDS.md shows a small but sign-consistent offset between
the torch reference and qbn_tpu on the non-saturated task (ours: OOD
entropy lower by ~0.04, OOD ECE higher by ~0.02, test error higher by
~0.01) that per-step lockstep training (tests/test_lockstep_torch.py)
cannot explain. The remaining cross-stack differences are the RANDOM DRAWS
each stack makes from its own RNG: the weight init, the train/valid split,
and the per-epoch shuffle order. This harness swaps them one at a time:

  ref      - run the UNMODIFIED reference float pointwise runner
             (reference: experiments/scripts/pointwise/float/
             pointwise_mnist.py:71-133) with two taps installed: the
             initial state_dict, and every SubsetRandomSampler draw
             (train/valid split + per-epoch order). Taps -> tap_s<seed>.npz.
  ours     - train qbn_tpu's pointwise LeNet under --init {own,torch} x
             --order {own,torch}; (own, own) is byte-for-byte the
             production flow (_fit + Trainer.train_loop); torch-init
             transplants the tapped init; torch-order replays the tapped
             batch stream (incl. the ragged tail, DataLoader drop_last
             semantics). Endpoints go through the REAL eval harness
             (evaluate_classification_uncertainty) -> results.json.
  refeval  - transplant the reference's FINAL weights into our model and
             evaluate through OUR harness (controls for eval-stack
             differences; docs/PARITY.md showed those are ~1e-3).
  summarize- table of test/random metrics per condition, mean +- std
             over seeds.

The condition whose swap moves (own, own) onto the reference's mean pins
the offset to that draw's law.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
REF_SCRIPT = ("experiments/scripts/pointwise/float/pointwise_mnist.py")


def tap_path(out: str, seed: int) -> str:
    return os.path.join(out, f"tap_s{seed}.npz")


# ---------------------------------------------------------------------------
# reference run with taps
# ---------------------------------------------------------------------------

def run_ref(args):
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from parity.torch_compat import install
    install(REFERENCE)
    import runpy

    import torch

    import src.data as sdata
    import src.models as smodels

    tap = {"init": None, "orders": [], "train_idx": None, "valid_idx": None}

    base_sampler = sdata.SubsetRandomSampler

    class RecordingSampler(base_sampler):
        def __init__(self, indices, *a, **kw):
            super().__init__(indices, *a, **kw)
            # record only the TRAINING-phase split (the eval harness
            # rebuilds loaders afterwards and must not overwrite the tap)
            if len(indices) > 2500:        # train split (90% of 5000)
                if tap["train_idx"] is None:
                    tap["train_idx"] = np.asarray(list(indices))
            elif tap["valid_idx"] is None:
                tap["valid_idx"] = np.asarray(list(indices))

        def __iter__(self):
            order = list(super().__iter__())
            if len(self.indices) > 2500:
                tap["orders"].append(np.asarray(order))
            for i in order:
                yield i

    sdata.SubsetRandomSampler = RecordingSampler

    orig_get = smodels.ModelFactory.get_model

    def tapping_get(model, input_size, output_size, q, a, **kw):
        net = orig_get(model, input_size, output_size, q, a, **kw)
        if tap["init"] is None:
            tap["init"] = {k: v.detach().cpu().numpy().copy()
                           for k, v in net.state_dict().items()}
        return net

    smodels.ModelFactory.get_model = staticmethod(tapping_get)

    out = os.path.abspath(args.out)
    data = os.path.abspath(args.data)
    os.makedirs(out, exist_ok=True)
    workdir = os.path.join(out, f"ref_s{args.seed}")
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    script = os.path.join(REFERENCE, REF_SCRIPT)
    sys.argv = [script, "--data", data, "--gpu", "-1", "--num_workers", "0",
                "--epochs", str(args.epochs), "--seed", str(args.seed),
                "--samples", str(args.samples)]
    print(f"[bisect] running reference: {' '.join(sys.argv)}", flush=True)
    runpy.run_path(script, run_name="__main__")

    exp = sorted(glob.glob(os.path.join(
        workdir, "not_q-mnist-classification-*")))[-1]
    final = torch.load(os.path.join(exp, "weights.pt"), map_location="cpu")
    payload = {}
    for k, v in tap["init"].items():
        payload["init__" + k] = v
    for k, v in final.items():
        payload["final__" + k] = v.detach().cpu().numpy().copy()
    payload["train_idx"] = tap["train_idx"]
    payload["valid_idx"] = tap["valid_idx"]
    payload["orders"] = np.stack(tap["orders"][:args.epochs])
    np.savez(tap_path(out, args.seed), **payload)
    print(f"[bisect] tap saved: {tap_path(out, args.seed)} "
          f"(orders {payload['orders'].shape}, exp {exp})", flush=True)


# ---------------------------------------------------------------------------
# qbn_tpu runs
# ---------------------------------------------------------------------------

def _transplant(variables, tw: dict, prefix: str):
    """Copy a tapped torch LeNet state_dict (bias-free: reference
    models_p.py:70-77) into our param tree (OIHW->HWIO, flatten order)."""
    import flax
    import jax.numpy as jnp

    params = flax.core.unfreeze(variables["params"]) if hasattr(
        flax.core, "unfreeze") else dict(variables["params"])

    def put(name, arr):
        assert params[name]["kernel"].shape == arr.shape, \
            (name, params[name]["kernel"].shape, arr.shape)
        params[name] = dict(params[name], kernel=jnp.asarray(arr))

    g = lambda k: tw[f"{prefix}__{k}"]  # noqa: E731
    put("conv_0", g("layers.0.weight").transpose(2, 3, 1, 0))
    put("conv_1", g("layers.2.weight").transpose(2, 3, 1, 0))
    put("fc_0", g("layers.5.weight").reshape(500, 50, 7, 7)
        .transpose(2, 3, 1, 0).reshape(2450, 500))
    put("fc_1", g("layers.7.weight").T)
    return dict(variables, params=params)


def _our_cfg(args, tag: str):
    from qbn_tpu.presets import preset
    cfg = preset("pointwise", "mnist", "float",
                 epochs=args.epochs, samples=args.samples,
                 data=os.path.abspath(args.data), seed=args.seed,
                 save=os.path.join(os.path.abspath(args.out),
                                   f"{tag}_s{args.seed}"))
    from qbn_tpu.flows import setup_experiment
    return setup_experiment(cfg)


def run_ours(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qbn_tpu.evaluation.harness import (
        evaluate_classification_uncertainty)
    from qbn_tpu.models.factory import build_model
    from qbn_tpu.training.checkpoint import (checkpoint_path,
                                             load_variables)
    from qbn_tpu.training.optim import build_optimizer
    from qbn_tpu.training.trainer import (Trainer, TrainState,
                                          _metrics_init, make_train_step)
    from qbn_tpu.utils import init_variables

    tag = f"ours_i{args.init}_o{args.order}"
    cfg = _our_cfg(args, tag)
    tap = None
    if "torch" in (args.init, args.order):
        tap = dict(np.load(tap_path(os.path.abspath(args.out), args.seed)))

    if args.order == "own":
        # production path: qbn_tpu/flows.py::_fit with an optional init
        # transplant between init_variables and training
        from qbn_tpu.data.loaders import get_train_loaders
        train_loader, valid_loader = get_train_loaders(cfg)
        x0, _ = next(iter(train_loader))
        cfg = cfg.replace(input_size=tuple(x0.shape[1:]))
        model = build_model(cfg)
        variables = init_variables(model, jax.random.PRNGKey(cfg.seed),
                                   jnp.asarray(x0))
        if args.init == "torch":
            variables = _transplant(variables, tap, "init")
        tx, _ = build_optimizer(cfg, len(train_loader))
        trainer = Trainer(model, cfg, tx, "float", train_loader,
                          valid_loader)
        state = trainer.init_state(variables,
                                   jax.random.PRNGKey(cfg.seed + 1))
        state, _ = trainer.train_loop(state)
        variables = load_variables(trainer.variables(state),
                                   checkpoint_path(cfg.save))
    else:
        # torch-order replay: the tapped split + per-epoch batch stream,
        # batched like DataLoader (consecutive chunks, ragged tail kept:
        # reference src/data.py:180-186 drop_last default)
        from qbn_tpu.data.datasets import _read_idx_images, _read_idx_labels
        x = _read_idx_images(os.path.join(
            cfg.data, "MNIST", "raw",
            "train-images-idx3-ubyte")).astype(np.float32) / 255.0
        y = _read_idx_labels(os.path.join(
            cfg.data, "MNIST", "raw", "train-labels-idx1-ubyte"))
        orders = tap["orders"]
        batch = cfg.batch_size
        spe = (orders.shape[1] + batch - 1) // batch
        cfg = cfg.replace(input_size=tuple(x.shape[1:]))
        model = build_model(cfg)
        variables = init_variables(model, jax.random.PRNGKey(cfg.seed),
                                   jnp.asarray(x[:batch]))
        if args.init == "torch":
            variables = _transplant(variables, tap, "init")
        tx, _ = build_optimizer(cfg, spe)
        step_fn = make_train_step(model, cfg, tx, "float", spe,
                                  int(len(x)))
        state = TrainState(
            params=variables["params"],
            model_state={k: v for k, v in variables.items()
                         if k != "params"},
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(cfg.seed + 1))
        for e in range(cfg.epochs):
            ms = _metrics_init(cfg.task)
            order = orders[e]
            for b in range(spe):
                sel = order[b * batch:(b + 1) * batch]
                state, ms, _ = step_fn(state, ms, jnp.asarray(x[sel]),
                                       jnp.asarray(y[sel]))
            print(f"[bisect] {tag} s{args.seed} epoch {e} done",
                  flush=True)
        variables = {"params": state.params, **state.model_state}

    evaluate_classification_uncertainty(model, variables, cfg,
                                        mode="float")
    print(f"[bisect] {tag} s{args.seed}: results in {cfg.save}", flush=True)


def run_refeval(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qbn_tpu.evaluation.harness import (
        evaluate_classification_uncertainty)
    from qbn_tpu.models.factory import build_model
    from qbn_tpu.utils import init_variables

    cfg = _our_cfg(args, "refeval")
    tap = dict(np.load(tap_path(os.path.abspath(args.out), args.seed)))
    cfg = cfg.replace(input_size=(28, 28, 1))
    model = build_model(cfg)
    variables = init_variables(model, jax.random.PRNGKey(cfg.seed),
                               jnp.zeros((2, 28, 28, 1), jnp.float32))
    variables = _transplant(variables, tap, "final")
    evaluate_classification_uncertainty(model, variables, cfg, mode="float")
    print(f"[bisect] refeval s{args.seed}: results in {cfg.save}",
          flush=True)


# ---------------------------------------------------------------------------
# summary
# ---------------------------------------------------------------------------

def summarize(args):
    rows = {}
    for d in sorted(glob.glob(os.path.join(args.out, "*_s*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        cond, seed = name.rsplit("_s", 1)
        res = None
        for r in glob.glob(os.path.join(d, "**", "results.json"),
                           recursive=True):
            res = r
        if res is None:
            continue
        with open(res) as fh:
            data = json.load(fh)
        for split in ("test", "random"):
            for metric in ("error", "ece", "entropy", "nll"):
                v = data.get(metric, {}).get(split)
                if v is None:
                    continue
                rows.setdefault((cond, split, metric), []).append(float(v))
    conds = sorted({c for c, _, _ in rows})
    print(f"{'split':8s} {'metric':8s} " +
          " ".join(f"{c:>22s}" for c in conds))
    for split in ("test", "random"):
        for metric in ("error", "ece", "entropy", "nll"):
            cells = []
            for c in conds:
                vals = rows.get((c, split, metric))
                cells.append("-" if not vals else
                             f"{np.mean(vals):.4f}+-{np.std(vals):.4f}"
                             f"({len(vals)})")
            print(f"{split:8s} {metric:8s} " +
                  " ".join(f"{s:>22s}" for s in cells))


def main(argv=None):
    p = argparse.ArgumentParser("hard-task offset bisect")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("ref", "ours", "refeval"):
        q = sub.add_parser(name)
        q.add_argument("--data", required=True)
        q.add_argument("--out", required=True)
        q.add_argument("--seed", type=int, default=1)
        q.add_argument("--epochs", type=int, default=20)
        q.add_argument("--samples", type=int, default=10)
        if name == "ours":
            q.add_argument("--init", choices=["own", "torch"],
                           default="own")
            q.add_argument("--order", choices=["own", "torch"],
                           default="own")
    q = sub.add_parser("summarize")
    q.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    {"ref": run_ref, "ours": run_ours, "refeval": run_refeval,
     "summarize": summarize}[args.cmd](args)


if __name__ == "__main__":
    main()
