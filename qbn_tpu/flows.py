"""End-to-end experiment flows: the reference's 24 runner scripts unified.

Float flow (reference: e.g. experiments/scripts/stochastic/bbb/float/
bbb_cifar.py:76-139): build -> train (Adam/SGHMC + cosine LR) -> reload
best checkpoint -> uncertainty evaluation.

QAT flow (reference: quantised/train/*.py:82-155): build quantised model ->
load float checkpoint -> QAT fine-tune (SGD m=0.9) -> convert to int8 ->
save -> rebuild + reload -> INT uncertainty evaluation. For SGHMC, each
posterior snapshot is fine-tuned and converted separately
(reference: sgld/quantised/train/sgld_cifar.py:95-145).

Regression flows loop (dataset x fold) with per-fold checkpoints
(reference: mcdropout_regression.py:84-127).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import subprocess
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qbn_tpu.config import Config
from qbn_tpu.data import get_train_loaders, get_test_loader
from qbn_tpu.evaluation.harness import (
    evaluate_classification_uncertainty, evaluate_regression_uncertainty,
)
from qbn_tpu.evaluation.ensemble import load_ensemble
from qbn_tpu.evaluation.results import init_results, save_results
from qbn_tpu.evaluation.writer import ScalarWriter
from qbn_tpu.models.factory import build_model
from qbn_tpu.training.checkpoint import (
    save_variables, load_variables, checkpoint_path, list_snapshots,
    save_config,
)
from qbn_tpu.training.optim import build_optimizer
from qbn_tpu.training.trainer import Trainer
from qbn_tpu.utils import init_variables, convert_model

log = logging.getLogger(__name__)

REGRESSION_DATASETS = [("synthetic", 1), ("housing", 10), ("concrete", 10),
                       ("energy", 10), ("power", 10), ("wine", 10),
                       ("yacht", 10)]


# ---------------------------------------------------------------------------
# Experiment directory setup (reference: src/utils.py:154-224)
# ---------------------------------------------------------------------------

def setup_experiment(cfg: Config, label: str = "") -> Config:
    """Create the run directory, wire logging, init the results store."""
    if not label:
        # reference: src/utils.py:155-161 — q='not_q'; if args.q: q='q';
        # if args.at: q+='at'  =>  {not_q, q, qat, not_qat}
        label = "q" if cfg.q else "not_q"
        if cfg.at:
            label += "at"
    stamp = time.strftime("%Y%m%d-%H%M%S")
    save = f"{label}-{cfg.dataset}-{cfg.task}-{stamp}"
    if cfg.save not in ("EXP", "", None):
        save = os.path.join(cfg.save, save) if os.path.isdir(cfg.save) \
            else cfg.save
    os.makedirs(save, exist_ok=True)
    cfg = cfg.replace(save=save)

    # one run = one log file: drop the previous run's handler first (grid
    # drivers call many runs in ONE process; stacked handlers would append
    # every later run's lines to every earlier run's log.log)
    root = logging.getLogger()
    for h in list(root.handlers):
        if getattr(h, "_qbn_run_log", False):
            root.removeHandler(h)
            h.close()
    fh = logging.FileHandler(os.path.join(save, "log.log"))
    fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    fh._qbn_run_log = True
    root.addHandler(fh)
    root.setLevel(logging.INFO)

    # provenance: config + git commit (replaces the reference's source
    # snapshotting, utils.py:167-175)
    save_config(cfg, os.path.join(save, "config.json"))
    try:
        rev = subprocess.run(["git", "rev-parse", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(
                                 os.path.abspath(__file__))).stdout.strip()
        with open(os.path.join(save, "GIT_REVISION"), "w") as f:
            f.write(rev + "\n")
    except Exception:
        pass

    save_results(init_results(cfg), save)
    if cfg.debug_nans:
        from qbn_tpu.profiling import enable_nan_debugging
        enable_nan_debugging()
    log.info("Experiment dir: %s", save)
    log.info("Config: %s", dataclasses.asdict(cfg))
    return cfg


def _fit(cfg: Config, mode: str, split: int = -1,
         special_info: str = "", init_from: Optional[str] = None,
         writer: Optional[ScalarWriter] = None):
    """Train one model; returns (model, trainer, final TrainState)."""
    train_loader, valid_loader = get_train_loaders(cfg, split=split)
    x0, _ = next(iter(train_loader))
    cfg = cfg.replace(input_size=tuple(x0.shape[1:]))
    model = build_model(cfg)
    variables = init_variables(model, jax.random.PRNGKey(cfg.seed),
                               jnp.asarray(x0),
                               quantized=bool(cfg.q or cfg.at))
    if init_from is not None:
        variables = load_variables(variables, init_from)
    tx, _ = build_optimizer(cfg, len(train_loader))
    from qbn_tpu.parallel.mesh import mesh_from_config
    mesh = mesh_from_config(cfg)
    if mesh is not None:
        log.info("SPMD training over mesh %s", dict(mesh.shape))
    # step_memo: cross-run reuse of the jitted/compiled steps — safe here
    # because tx is always build_optimizer(cfg, len(train_loader)) on this
    # path, which is exactly the memo's contract
    trainer = Trainer(model, cfg, tx, mode, train_loader, valid_loader,
                      writer=writer, mesh=mesh, step_memo=True)
    state = trainer.init_state(variables, jax.random.PRNGKey(cfg.seed + 1))
    from qbn_tpu.profiling import trace
    with trace(os.path.join(cfg.save, "profile"), enabled=cfg.profile):
        state, best = trainer.train_loop(state, special_info=special_info)
    log.info("finished training%s: best val %.4f (train %.1fs, val %.1fs)",
             special_info, best, trainer.train_time, trainer.val_time)
    return model, trainer, state


# ---------------------------------------------------------------------------
# Float flows
# ---------------------------------------------------------------------------

def run_float_classification(cfg: Config) -> None:
    writer = ScalarWriter(cfg.save)
    model, trainer, state = _fit(cfg, mode="float", writer=writer)
    # reload the best/last checkpoint for evaluation
    variables = load_variables(trainer.variables(state),
                               checkpoint_path(cfg.save))
    ensemble = cfg.method == "sgld"
    if ensemble:
        variables = load_ensemble(variables, cfg.save, cfg.samples)
    evaluate_classification_uncertainty(model, variables, cfg, mode="float",
                                        ensemble=ensemble)


def run_float_regression(cfg: Config, datasets=None) -> None:
    writer = ScalarWriter(cfg.save)
    datasets = datasets if datasets is not None else REGRESSION_DATASETS
    for dataset, n_folds in datasets:
        for fold in range(n_folds):
            fcfg = cfg.replace(dataset=f"regression_{dataset}")
            log.info("## training %s fold %d ##", dataset, fold)
            _fit(fcfg, mode="float", split=fold,
                 special_info=f"_{dataset}_{fold}", writer=writer)
            if cfg.debug:
                break
    evaluate_regression_uncertainty(cfg, mode="float", datasets=datasets)


# ---------------------------------------------------------------------------
# QAT flows
# ---------------------------------------------------------------------------

def _qat_one(cfg: Config, float_ckpt: str, split: int = -1,
             special_info: str = "", writer=None) -> None:
    """Fine-tune one quantised model from a float checkpoint, convert to
    int8, and overwrite the checkpoint with the converted variables."""
    model, trainer, state = _fit(cfg, mode="qat", split=split,
                                 special_info=special_info,
                                 init_from=float_ckpt, writer=writer)
    variables = load_variables(trainer.variables(state),
                               checkpoint_path(cfg.save, special_info))
    loader, _ = get_train_loaders(cfg, split=split)
    x0, _ = next(iter(loader))
    variables = convert_model(model, variables, jnp.asarray(x0),
                              jax.random.PRNGKey(cfg.seed + 2))
    save_variables(variables, checkpoint_path(cfg.save, special_info))


def run_qat_classification(cfg: Config, load_dir: str) -> None:
    writer = ScalarWriter(cfg.save)
    ensemble = cfg.method == "sgld"
    if ensemble:
        # fine-tune + convert each posterior snapshot
        snaps = list_snapshots(load_dir)
        if not snaps:
            raise FileNotFoundError(f"no SGHMC snapshots in {load_dir}")
        for p in snaps[-cfg.samples:]:
            info = "_" + os.path.basename(p).split("weights_")[1].split(
                ".msgpack")[0]
            _qat_one(cfg, p, special_info=info, writer=writer)
    else:
        _qat_one(cfg, checkpoint_path(load_dir), writer=writer)

    # rebuild + reload converted weights, evaluate the INT path
    test_loader, _ = get_train_loaders(cfg)
    x0, _ = next(iter(test_loader))
    model = build_model(cfg)
    variables = init_variables(model, jax.random.PRNGKey(cfg.seed),
                               jnp.asarray(x0), quantized=True)
    if ensemble:
        variables = load_ensemble(variables, cfg.save, cfg.samples)
    else:
        variables = load_variables(variables, checkpoint_path(cfg.save))
    evaluate_classification_uncertainty(model, variables, cfg, mode="int",
                                        ensemble=ensemble)


def run_qat_regression(cfg: Config, load_dir: str, datasets=None) -> None:
    writer = ScalarWriter(cfg.save)
    datasets = datasets if datasets is not None else REGRESSION_DATASETS
    ensemble = cfg.method == "sgld"
    for dataset, n_folds in datasets:
        for fold in range(n_folds):
            fcfg = cfg.replace(dataset=f"regression_{dataset}")
            if ensemble:
                # fine-tune + convert each posterior snapshot of this fold
                # (reference: sgld/quantised/train/*_regression flow)
                snaps = list_snapshots(load_dir, f"{dataset}_{fold}_")
                for p in snaps[-cfg.samples:]:
                    info = "_" + os.path.basename(p).split(
                        "weights_")[1].split(".msgpack")[0]
                    _qat_one(fcfg, p, split=fold, special_info=info,
                             writer=writer)
            else:
                info = f"_{dataset}_{fold}"
                _qat_one(fcfg, checkpoint_path(load_dir, info), split=fold,
                         special_info=info, writer=writer)
            if cfg.debug:
                break
    evaluate_regression_uncertainty(cfg, mode="int", datasets=datasets)
