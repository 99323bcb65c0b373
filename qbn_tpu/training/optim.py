"""Optimiser factory + adaptive global-norm clipping.

The reference guards SGHMC with an adaptive gradient clip: a rolling buffer
of the last 1000 accepted gradient norms sets the clip threshold at
mean + 30*std (reference: src/trainer.py:24-27,108-117). Here that buffer
lives on device as a fixed-size circular buffer inside an optax transform —
no host round trip per step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from qbn_tpu.config import Config
from qbn_tpu.training.sghmc import sghmc


class AdaptiveClipState(NamedTuple):
    buffer: jnp.ndarray   # (window,) past accepted grad norms
    count: jnp.ndarray    # number of accepted norms so far
    max_grad: jnp.ndarray


def clip_by_adaptive_global_norm(window: int = 1000, std_mul: float = 30.0,
                                 init_max: float = 1e20):
    """Clip grads to mean + std_mul*std of the last `window` accepted norms.

    Norms that hit the threshold are clipped and NOT written to the buffer
    (the reference pops them back off); the threshold only starts moving
    once the buffer has filled.
    """

    def init(params):
        del params
        return AdaptiveClipState(
            buffer=jnp.zeros((window,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
            max_grad=jnp.asarray(init_max, jnp.float32),
        )

    def update(grads, state, params=None):
        del params
        norm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, state.max_grad / (norm + 1e-12))
        clipped = jax.tree.map(lambda gr: gr * scale, grads)
        accepted = norm < state.max_grad
        idx = state.count % window
        buffer = jnp.where(
            accepted, state.buffer.at[idx].set(norm), state.buffer)
        count = state.count + accepted.astype(jnp.int32)
        full = count >= window
        mean = jnp.sum(buffer) / jnp.maximum(count, 1)
        # population std over the filled region
        filled = (jnp.arange(window) <
                  jnp.minimum(count, window)).astype(jnp.float32)
        var = (jnp.sum(filled * (buffer - mean) ** 2)
               / jnp.maximum(jnp.sum(filled), 1.0))
        new_max = jnp.where(full, mean + std_mul * jnp.sqrt(var),
                            state.max_grad)
        return clipped, AdaptiveClipState(buffer, count, new_max)

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg: Config, steps_per_epoch: int,
                    total_epochs: Optional[int] = None):
    """Construct the optax chain + LR schedule for a config.

    Reference pairings: Adam + cosine for float training, SGD(momentum 0.9)
    for QAT fine-tuning, SGHMC for the sgld method
    (reference: runner scripts, e.g. bbb_cifar.py:105-111).
    """
    epochs = total_epochs if total_epochs is not None else cfg.epochs
    if cfg.lr_schedule == "cosine":
        # torch CosineAnnealingLR stepped once per epoch
        def schedule(count):
            epoch = jnp.minimum(count // max(steps_per_epoch, 1), epochs)
            return cfg.learning_rate * 0.5 * (
                1.0 + jnp.cos(jnp.pi * epoch / epochs))
    else:
        schedule = cfg.learning_rate

    if cfg.optimizer == "sghmc":
        tx = optax.chain(
            clip_by_adaptive_global_norm(),
            sghmc(
                learning_rate=schedule
                if callable(schedule) else schedule,
                burnin_steps=cfg.burnin_epochs * steps_per_epoch,
                resample_momentum_every=cfg.resample_momentum_iterations,
                resample_prior_every=cfg.resample_prior_iterations,
                base_c=cfg.base_c,
                gauss_sig=cfg.gauss_sig,
                alpha0=cfg.alpha0,
                beta0=cfg.beta0,
                seed=cfg.seed,
            ),
        )
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(schedule, momentum=cfg.momentum)
    elif cfg.optimizer == "adam":
        # torch Adam's weight_decay is additive L2 on the gradient (not
        # decoupled AdamW): wd*p enters the Adam moments.
        if cfg.weight_decay:
            tx = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(schedule),
            )
        else:
            tx = optax.adam(schedule)
    else:
        raise NotImplementedError(cfg.optimizer)
    return tx, schedule
