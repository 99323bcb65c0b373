"""Uncertainty evaluation harness: in-distribution + OOD + distortion sweep.

Re-design of the reference evaluation workhorse
(reference: experiments/utils.py:24-291): for a trained model, evaluate the
train/valid/test splits, the OOD set (FashionMNIST for MNIST, SVHN for
CIFAR), and 3 distortions x 5 severity levels, recording error/ECE/
entropy/NLL (+ measured MC-samples/sec into the latency slot) into the
results store, with reliability/confidence plots. Regression evaluates the
synthetic task plus 6 UCI datasets x 10 folds, reloading per-fold weights,
and renders the epistemic/aleatoric decomposition plot.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qbn_tpu.config import Config
from qbn_tpu.data import get_train_loaders, get_test_loader
from qbn_tpu.data.datasets import regression_function, \
    regression_data_generator
from qbn_tpu.data.distortions import DISTORTIONS, LEVELS
from qbn_tpu.evaluation.mc import (evaluate_distortion_sweep,
                                   evaluate_with_loader, mc_predict)
from qbn_tpu.evaluation.plots import (
    plot_reliability, plot_confidence_histogram,
    plot_regression_uncertainty,
)
from qbn_tpu.evaluation.results import load_results, save_results, \
    init_results
from qbn_tpu.evaluation.ensemble import load_ensemble
from qbn_tpu.models.factory import build_model
from qbn_tpu.training.checkpoint import (
    load_variables, checkpoint_path, model_size_mb,
)
from qbn_tpu.utils import init_variables

log = logging.getLogger(__name__)

REGRESSION_DATASETS = [("synthetic", 1), ("housing", 10), ("concrete", 10),
                       ("energy", 10), ("power", 10), ("wine", 10),
                       ("yacht", 10)]


def _record(results, split, error, ece, entropy, nll, sps):
    for key, val in (("error", error), ("ece", ece), ("entropy", entropy),
                     ("nll", nll), ("latency", sps)):
        results[key][split] = val


def _record_distortion(results, distortion, level, error, ece, entropy, nll):
    for key, val in (("error", error), ("ece", ece), ("entropy", entropy),
                     ("nll", nll)):
        results[key].setdefault(distortion, {})[str(level)] = val


def evaluate_and_record(model, variables, cfg: Config, mode: str, results,
                        ensemble: bool = False, mesh=None):
    """Train/valid/test evaluation (reference: experiments/utils.py:379-418).
    Returns (test probs, test targets) for the calibration plots."""
    train_loader, val_loader = get_train_loaders(cfg)
    test_loader = get_test_loader(cfg)
    out = tgt = None
    for split, loader in (("train", train_loader), ("valid", val_loader),
                          ("test", test_loader)):
        if loader is None:
            continue
        error, ece, entropy, nll, o, t, sps = evaluate_with_loader(
            loader, model, variables, cfg, mode, ensemble=ensemble,
            salt=split, mesh=mesh)
        log.info("## %s error=%.4f ece=%.4f entropy=%.4f nll=%.4f "
                 "(%.0f MC-samples/s) ##", split, error, ece, entropy, nll,
                 sps)
        _record(results, split, error, ece, entropy, nll, sps)
        if split == "test":
            out, tgt = o, t
    return out, tgt


def evaluate_classification_uncertainty(model, variables, cfg: Config,
                                        mode: str,
                                        ensemble: bool = False):
    """The full MNIST/CIFAR uncertainty protocol
    (reference: experiments/utils.py:24-132)."""
    from qbn_tpu.parallel.mesh import mesh_from_config
    mesh = mesh_from_config(cfg)
    base_dataset = cfg.dataset
    results = load_results(cfg.save) or init_results(cfg)
    results["model_size"] = model_size_mb(variables)
    out, tgt = evaluate_and_record(model, variables, cfg, mode, results,
                                   ensemble, mesh=mesh)
    if out is not None:
        plot_reliability(out, tgt, os.path.join(cfg.save, "ece_test.png"))
        plot_confidence_histogram(out, os.path.join(cfg.save,
                                                    "certainty_test.png"))

    # OOD set: FashionMNIST / SVHN under the 'random' key
    ood_cfg = cfg.replace(dataset="random_" + base_dataset)
    ood_loader = get_test_loader(ood_cfg)
    error, ece, entropy, nll, out, tgt, sps = evaluate_with_loader(
        ood_loader, model, variables, cfg, mode, ensemble=ensemble,
        salt="random", mesh=mesh)
    log.info("## random error=%.4f ece=%.4f entropy=%.4f nll=%.4f ##",
             error, ece, entropy, nll)
    _record(results, "random", error, ece, entropy, nll, sps)
    if out is not None:
        plot_reliability(out, tgt, os.path.join(cfg.save, "ece_random.png"))
        plot_confidence_histogram(out, os.path.join(cfg.save,
                                                    "certainty_random.png"))

    sweep = evaluate_distortion_sweep(model, variables, cfg, mode,
                                      ensemble=ensemble, mesh=mesh)
    if sweep is not None:
        # device-resident fast path: clean test set uploaded once,
        # distortions generated on device (mc.evaluate_distortion_sweep)
        for distortion, level, error, ece, entropy, nll in sweep:
            log.info("## %s level %d: error=%.4f ece=%.4f entropy=%.4f "
                     "nll=%.4f ##", distortion, level + 1, error, ece,
                     entropy, nll)
            _record_distortion(results, distortion, level, error, ece,
                               entropy, nll)
    else:
        for distortion in DISTORTIONS:
            for level in range(LEVELS):
                loader = get_test_loader(cfg, distortion, level)
                error, ece, entropy, nll, _, _, _ = evaluate_with_loader(
                    loader, model, variables, cfg, mode, ensemble=ensemble,
                    collect_outputs=False, salt=f"{distortion}{level}",
                    mesh=mesh)
                log.info("## %s level %d: error=%.4f ece=%.4f entropy=%.4f "
                         "nll=%.4f ##", distortion, level + 1, error, ece,
                         entropy, nll)
                _record_distortion(results, distortion, level, error, ece,
                                   entropy, nll)
                if cfg.debug:
                    break
            if cfg.debug:
                break
    save_results(results, cfg.save)
    return results


def evaluate_regression_uncertainty(cfg: Config, mode: str,
                                    datasets=None):
    """Multi-dataset regression protocol: per-fold model reload + nanmean
    across folds + synthetic decomposition plot
    (reference: experiments/utils.py:134-291)."""
    from qbn_tpu.parallel.mesh import mesh_from_config
    mesh = mesh_from_config(cfg)
    results = load_results(cfg.save) or init_results(cfg)
    ensemble = cfg.method == "sgld"
    datasets = datasets if datasets is not None else REGRESSION_DATASETS
    for dataset, n_folds in datasets:
        name = f"regression_{dataset}"
        per_split = {s: {"rmse": [], "nll": []}
                     for s in ("train", "valid", "test")}
        for fold in range(n_folds):
            fcfg = cfg.replace(dataset=name)
            train_loader, val_loader = get_train_loaders(fcfg, split=fold)
            test_loader = get_test_loader(fcfg, split=fold)
            x0, _ = next(iter(train_loader))
            fcfg = fcfg.replace(input_size=(x0.shape[1],))
            model = build_model(fcfg)
            variables = init_variables(
                model, jax.random.PRNGKey(fcfg.seed), jnp.asarray(x0),
                quantized=bool(fcfg.q or fcfg.at))
            info = f"_{dataset}_{fold}"
            if ensemble:
                variables = load_ensemble(variables, cfg.save, cfg.samples,
                                          special_info=f"{dataset}_{fold}_")
            else:
                variables = load_variables(
                    variables, checkpoint_path(cfg.save, info))
            results["model_size"] = model_size_mb(variables)
            for split, loader in (("train", train_loader),
                                  ("valid", val_loader),
                                  ("test", test_loader)):
                if loader is None:
                    continue
                error, _, _, nll, _, _, _ = evaluate_with_loader(
                    loader, model, variables, fcfg, mode, ensemble=ensemble,
                    collect_outputs=False, seed=fold,
                    salt=f"{name}_{split}", mesh=mesh)
                per_split[split]["rmse"].append(error)
                per_split[split]["nll"].append(nll)
            if cfg.debug:
                break
        for split in ("train", "valid", "test"):
            if not per_split[split]["rmse"]:
                continue
            rmse = float(np.nanmean(per_split[split]["rmse"]))
            nll = float(np.nanmean(per_split[split]["nll"]))
            results["error"].setdefault(name, {})[split] = rmse
            results["nll"].setdefault(name, {})[split] = nll
            log.info("## %s %s rmse=%.4f nll=%.4f ##", name, split, rmse,
                     nll)
    save_results(results, cfg.save)
    plot_synthetic_decomposition(cfg, mode)
    return results


def plot_synthetic_decomposition(cfg: Config, mode: str,
                                 n_grid: int = 1000):
    """Epistemic/aleatoric decomposition over x in [-5, 5] with 100 MC
    samples (reference: experiments/utils.py:236-289)."""
    scfg = cfg.replace(dataset="regression_synthetic", input_size=(1,))
    samples = cfg.samples
    if cfg.method != "sgld" and samples != 1:
        samples = 100
    ensemble = cfg.method == "sgld"

    model = build_model(scfg)
    x0 = jnp.ones((2, 1))
    variables = init_variables(model, jax.random.PRNGKey(scfg.seed), x0,
                               quantized=bool(scfg.q or scfg.at))
    try:
        if ensemble:
            variables = load_ensemble(variables, cfg.save, cfg.samples,
                                      special_info="synthetic_0_")
        else:
            variables = load_variables(
                variables, checkpoint_path(cfg.save, "_synthetic_0"))
    except FileNotFoundError:
        log.warning("no synthetic checkpoint found — skipping plot")
        return

    x_grid = np.linspace(-5, 5, n_grid, dtype=np.float32).reshape(-1, 1)
    y_true = 2 * x_grid + 8

    @jax.jit
    def predict(v, xb, key):
        n_mc = cfg.samples if ensemble else samples
        return mc_predict(model, v, xb, key, samples=n_mc, mode=mode,
                          ensemble=ensemble)

    mus, ep, al = [], [], []
    batch = 25
    for i in range(0, n_grid, batch):
        xb = jnp.asarray(x_grid[i:i + batch])
        mu, var = predict(variables, xb,
                          jax.random.fold_in(jax.random.PRNGKey(7), i))
        mu, var = np.asarray(mu), np.asarray(var)
        mus.append(mu.mean(0))
        ep.append(mu.var(0, ddof=1) if mu.shape[0] > 1
                  else np.zeros_like(mu[0]))
        al.append(var.mean(0))
    x_tr, y_tr = regression_data_generator(n_points=20, seed=cfg.seed)
    plot_regression_uncertainty(
        x_grid, y_true, np.concatenate(mus), np.concatenate(ep),
        np.concatenate(al), x_tr, y_tr,
        os.path.join(cfg.save, "regression.png"),
        multi_sample=samples > 1)
