"""ELBO-style losses for classification and heteroscedastic regression.

Formula-exact equivalents of the reference losses
(reference: src/losses.py:18-51), as pure functions:

  classification ('whole'):  n_points * NLL(log(p + 1e-8), y) * multiplier
                             + gamma * KL / n_batches
  classification ('batch'):  NLL(log(p + 1e-8), y)
                             + gamma * KL / (batch * n_batches)
  regression ('whole'):      n_points * mean_B sum_D [ (y-mu)^2/(var+1e-8)
                             + log(var + 1e-8) ] * multiplier
                             + gamma * KL / n_batches
  regression ('batch'):      as above without n_points/multiplier and with
                             KL / (batch * n_batches)

Each returns (loss, main_obj, kl_term).
"""

from __future__ import annotations

import jax.numpy as jnp


def classification_loss(probs, target, kl, gamma, n_batches, n_points,
                        scaling: str = "batch", loss_multiplier: float = 1.0):
    """Negative log likelihood of softmax outputs + scaled KL.

    Args:
      probs: (B, C) predicted class probabilities (post-softmax).
      target: (B,) integer labels.
      kl: scalar KL divergence (0 for non-Bayesian models).
      gamma: KL weight.
      n_batches: number of batches per epoch.
      n_points: number of points in the dataset.
    """
    logp = jnp.log(probs + 1e-8)
    nll = -jnp.mean(jnp.take_along_axis(logp, target[:, None], axis=1))
    if scaling == "whole":
        ce = n_points * nll * loss_multiplier
        kl_term = kl / n_batches
    elif scaling == "batch":
        ce = nll
        kl_term = kl / (target.shape[0] * n_batches)
    else:
        raise NotImplementedError("Other scaling not implemented!")
    loss = ce + gamma * kl_term
    return loss, ce, kl_term


def regression_loss(output, target, kl, gamma, n_batches, n_points,
                    scaling: str = "batch", loss_multiplier: float = 1.0):
    """Heteroscedastic Gaussian NLL + scaled KL.

    Args:
      output: (mean, var) tuple, each (B, D).
      target: (B, D) regression targets.
    """
    mean, var = output
    precision = 1.0 / (var + 1e-8)
    point = jnp.sum(precision * (target - mean) ** 2 + jnp.log(var + 1e-8),
                    axis=1)
    het = jnp.mean(point, axis=0)
    if scaling == "whole":
        het = n_points * het * loss_multiplier
        kl_term = kl / n_batches
    elif scaling == "batch":
        kl_term = kl / (target.shape[0] * n_batches)
    else:
        raise NotImplementedError("Other scaling not implemented!")
    loss = het + gamma * kl_term
    return loss, het, kl_term


LOSS_FACTORY = {
    "classification": classification_loss,
    "regression": regression_loss,
}
