"""Experiment fan-out: vmapped multi-seed training.

The reference runs 3 seeds x (method x dataset) sequentially via shell loops
(reference: run_all_float.sh:8-13). For the small-model tier (regression
MLPs, LeNet) a TPU chip can train every seed SIMULTANEOUSLY: the train step
is vmapped over a stacked-seed TrainState, turning the seed loop into a
batched XLA program (and shardable over a mesh axis for larger fan-outs).

Seeds differ in parameter init and sampling noise; they share the batch
stream (the reference also reshuffles per seed — distributionally
equivalent for i.i.d. batches).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from qbn_tpu.config import Config
from qbn_tpu.evaluation.ensemble import stack_variables
from qbn_tpu.training.trainer import make_train_step, TrainState, \
    _metrics_init
from qbn_tpu.utils import init_variables


def init_seed_states(model, cfg: Config, tx, sample_input,
                     seeds: Sequence[int]) -> TrainState:
    """Stacked TrainState with a leading seed axis."""
    states = []
    for s in seeds:
        variables = init_variables(model, jax.random.PRNGKey(s),
                                   sample_input,
                                   quantized=bool(cfg.q or cfg.at))
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        states.append(TrainState(
            params=params, model_state=model_state,
            opt_state=tx.init(params), step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(s + 9999)))
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *states)


def make_vmapped_train_step(model, cfg: Config, tx, mode: str,
                            n_batches: int, n_points: int):
    """Train step over a stacked-seed TrainState; batch is shared."""
    base = make_train_step(model, cfg, tx, mode, n_batches, n_points,
                           jit_compile=False)
    return jax.jit(jax.vmap(base, in_axes=(0, 0, None, None)))


def init_stacked_metrics(cfg: Config, n_seeds: int):
    one = _metrics_init(cfg.task)
    return jax.tree.map(
        lambda l: jnp.broadcast_to(l, (n_seeds,) + l.shape), one)
