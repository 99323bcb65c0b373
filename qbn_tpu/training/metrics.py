"""Streaming uncertainty metrics as pure functions over explicit state.

Formula-exact equivalents of the reference metrics
(reference: src/metrics.py:8-229,381-383): every metric is a (sum, count)
accumulator updated per batch, so metric state is a small pytree that lives
inside jitted eval steps and can be psum-reduced across a device mesh.

Classification: error, NLL (-sum one_hot*log(p+1e-8) / N), Brier
(sum (p-one_hot)^2 / N), predictive entropy (-sum p*log(p+1e-8) / N), and
10-bin l1 expected calibration error binned on max-probability confidence
(torchmetrics CalibrationError(n_bins=10, norm='l1') semantics).

Regression: Gaussian NLL (0.5*log(2*pi*var + 1e-8) + (t-mu)^2/(2*var + 1e-8)),
MSE, RMSE, MAE.
"""

from __future__ import annotations

import jax.numpy as jnp

ECE_BINS = 10


# --------------------------------------------------------------------------
# Classification
# --------------------------------------------------------------------------

def cls_metrics_init(n_bins: int = ECE_BINS):
    z = jnp.zeros((), jnp.float32)
    return {
        "errors": z,
        "nll_sum": z,
        "brier_sum": z,
        "entropy_sum": z,
        "count": z,
        "ece_conf": jnp.zeros((n_bins,), jnp.float32),
        "ece_acc": jnp.zeros((n_bins,), jnp.float32),
        "ece_count": jnp.zeros((n_bins,), jnp.float32),
    }


def cls_metrics_update(state, probs, target):
    """Accumulate one batch of (B, C) probabilities and (B,) labels."""
    probs = probs.astype(jnp.float32)
    n_bins = state["ece_count"].shape[0]
    n = jnp.asarray(target.shape[0], jnp.float32)

    preds = jnp.argmax(probs, axis=1)
    correct = (preds == target).astype(jnp.float32)

    one_hot = jnp.zeros_like(probs).at[jnp.arange(probs.shape[0]),
                                       target].set(1.0)
    logp = jnp.log(probs + 1e-8)

    conf = jnp.max(probs, axis=1)
    # torchmetrics CalibrationError binning (the reference's ECE,
    # src/metrics.py:381-383): bucketize(conf, linspace(0,1,n+1),
    # right=True) - 1, clamped — a confidence exactly on a (float32)
    # boundary lands in the UPPER bin; conf == 1.0 lands in the top bin.
    boundaries = jnp.linspace(0.0, 1.0, n_bins + 1, dtype=jnp.float32)
    bin_idx = jnp.clip(
        jnp.sum(conf[:, None] >= boundaries[None, 1:],
                axis=1).astype(jnp.int32),
        0, n_bins - 1)

    return {
        "errors": state["errors"] + jnp.sum(1.0 - correct),
        "nll_sum": state["nll_sum"] + jnp.sum(-one_hot * logp),
        "brier_sum": state["brier_sum"] + jnp.sum((probs - one_hot) ** 2),
        "entropy_sum": state["entropy_sum"] + jnp.sum(-probs * logp),
        "count": state["count"] + n,
        "ece_conf": state["ece_conf"].at[bin_idx].add(conf),
        "ece_acc": state["ece_acc"].at[bin_idx].add(correct),
        "ece_count": state["ece_count"].at[bin_idx].add(1.0),
    }


def cls_metrics_compute(state):
    count = jnp.maximum(state["count"], 1.0)
    bin_n = state["ece_count"]
    safe_n = jnp.maximum(bin_n, 1.0)
    acc = state["ece_acc"] / safe_n
    conf = state["ece_conf"] / safe_n
    ece = jnp.sum(jnp.where(bin_n > 0, jnp.abs(acc - conf) * bin_n, 0.0))
    ece = ece / jnp.maximum(jnp.sum(bin_n), 1.0)
    return {
        "error": state["errors"] / count,
        "nll": state["nll_sum"] / count,
        "brier": state["brier_sum"] / count,
        "entropy": state["entropy_sum"] / count,
        "ece": ece,
    }


# --------------------------------------------------------------------------
# Regression
# --------------------------------------------------------------------------

def reg_metrics_init():
    z = jnp.zeros((), jnp.float32)
    return {
        "nll_sum": z,
        "se_sum": z,
        "ae_sum": z,
        "count": z,
    }


def reg_metrics_update(state, mean, var, target):
    """Accumulate one batch of predictive (mean, var) and targets."""
    mean = mean.reshape(-1).astype(jnp.float32)
    var = var.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    n = jnp.asarray(target.shape[0], jnp.float32)
    err = target - mean
    nll = jnp.sum(0.5 * jnp.log(2.0 * jnp.pi * var + 1e-8)
                  + err ** 2 / (2.0 * var + 1e-8))
    return {
        "nll_sum": state["nll_sum"] + nll,
        "se_sum": state["se_sum"] + jnp.sum(err ** 2),
        "ae_sum": state["ae_sum"] + jnp.sum(jnp.abs(err)),
        "count": state["count"] + n,
    }


def reg_metrics_compute(state):
    count = jnp.maximum(state["count"], 1.0)
    mse = state["se_sum"] / count
    return {
        "nll": state["nll_sum"] / count,
        "mse": mse,
        "rmse": jnp.sqrt(mse),
        "mae": state["ae_sum"] / count,
    }


# --------------------------------------------------------------------------
# Simple running average (obj / main_obj / kl reporting)
# --------------------------------------------------------------------------

def avg_init(keys=("obj", "main_obj", "kl")):
    z = jnp.zeros((), jnp.float32)
    return {k: {"sum": z, "cnt": z} for k in keys}


def avg_update(state, **values):
    out = dict(state)
    for k, v in values.items():
        out[k] = {"sum": state[k]["sum"] + v, "cnt": state[k]["cnt"] + 1.0}
    return out


def avg_compute(state):
    return {k: v["sum"] / jnp.maximum(v["cnt"], 1.0) for k, v in state.items()}
