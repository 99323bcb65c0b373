"""Mesh-sharded train and MC-eval steps.

SPMD recipe: parameters/optimiser state replicated, batch sharded over the
'data' axis for training; MC samples sharded over the 'sample' axis for
evaluation (each device draws its chunk of posterior samples, including
the fused presampling plan, then outputs gather back). XLA inserts the
collectives — no hand-written psums (the scaling-book recipe: annotate
shardings, let the compiler place collectives on ICI).

Partial batches (batch % n_devices != 0) fall back to the unsharded step
in the Trainer, so mesh runs are numerically IDENTICAL to single-device
runs — sharding is a placement change, never a math change.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qbn_tpu.config import Config
from qbn_tpu.training.trainer import make_train_step, make_eval_step
from qbn_tpu.training import metrics as M
from qbn_tpu.evaluation.mc import mc_predict, aggregate
from qbn_tpu.utils import split_rngs


def make_sharded_train_step(model, cfg: Config, tx, mode: str,
                            n_batches: int, n_points: int, mesh: Mesh):
    """Data-parallel training step: state replicated, batch sharded."""
    base = make_train_step(model, cfg, tx, mode, n_batches, n_points,
                           jit_compile=False)
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.jit(
        base,
        in_shardings=(rep, rep, data, data),
        out_shardings=(rep, rep, rep),
    )


def make_sharded_eval_step(model, cfg: Config, mode: str,
                           update_observers: bool, mesh: Mesh):
    """Data-parallel (validation) eval step."""
    base = make_eval_step(model, cfg, mode, update_observers,
                          jit_compile=False)
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.jit(base, in_shardings=(rep, rep, data, data, rep),
                   out_shardings=(rep, rep))


def make_sharded_mc_eval(model, cfg: Config, mode: str, mesh: Mesh,
                         samples: Optional[int] = None,
                         ensemble: bool = False, plan=None):
    """MC evaluation with the posterior-sample axis sharded over the mesh.

    Each device draws samples/n_devices posterior samples from a
    device-specific key (shard_map over the last mesh axis), INCLUDING the
    fused bulk presampling plan — the Pallas weight-draw kernel runs
    per-device on its chunk, so the two fast paths compose. The batch is
    replicated (the sample axis is the long axis: 20-100 samples).

    Requires samples % n_devices == 0 (callers fall back to the unsharded
    evaluator otherwise).
    """
    samples = cfg.samples if samples is None else samples
    task = cfg.task
    axis = mesh.axis_names[-1]
    n_dev = mesh.shape[axis]
    assert samples % n_dev == 0, (samples, n_dev)
    chunk = samples // n_dev

    def per_device(variables, x, key):
        idx = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key, idx)
        if ensemble:
            # variables arrive with the member axis sharded over `axis`
            outs = jax.vmap(
                lambda v, kk: _one(variables_tree=v, x=x, kk=kk),
                in_axes=(0, 0))(variables, jax.random.split(k, chunk))
        else:
            outs = mc_predict(model, variables, x, k, samples=chunk,
                              mode=mode, ensemble=False, plan=plan)
        return outs

    def _one(variables_tree, x, kk):
        out, _ = model.apply(variables_tree, x, train=False, mode=mode,
                             update_stats=False, rngs=split_rngs(kk),
                             mutable=["kl"])
        return out

    var_spec = P(axis) if ensemble else P()
    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(var_spec, P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def step(variables, metric_state, x, y, key):
        outs = sharded(variables, x, key)
        agg = aggregate(task, outs, samples)
        if task == "classification":
            metric_state = M.cls_metrics_update(metric_state, agg, y)
        else:
            mean, var = agg
            metric_state = M.reg_metrics_update(metric_state, mean, var, y)
        return metric_state, agg

    return step
