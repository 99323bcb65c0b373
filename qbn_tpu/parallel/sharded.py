"""Mesh-sharded train and MC-eval steps.

SPMD recipe: parameters/optimiser state replicated, batch sharded over the
'data' axis, MC-sample keys (or ensemble members) sharded over the 'sample'
axis. XLA inserts the psum for gradients and metric sums — no hand-written
collectives (the scaling-book recipe: annotate shardings, let the compiler
place collectives on ICI).
"""

from __future__ import annotations

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
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        base,
        in_shardings=(rep, rep, data, data),
        out_shardings=(rep, rep, rep),
    )


def make_sharded_mc_eval(model, cfg: Config, mode: str, mesh: Mesh,
                         samples: Optional[int] = None,
                         ensemble: bool = False):
    """MC evaluation with the sample axis sharded over 'sample' and the
    batch over 'data' (when those axes exist in the mesh)."""
    samples = cfg.samples if samples is None else samples
    task = cfg.task
    axes = mesh.axis_names
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data")) if "data" in axes else rep
    if "sample" in axes and not ensemble:
        key_sh = NamedSharding(mesh, P("sample"))
    else:
        key_sh = rep

    def step(variables, metric_state, x, y, keys):
        outs = jax.vmap(
            lambda k: mc_predict(model, variables, x, k, samples=1,
                                 mode=mode)[0]
            if task == "classification" else
            jax.tree.map(lambda o: o[0],
                         mc_predict(model, variables, x, k, samples=1,
                                    mode=mode))
        )(keys)
        agg = aggregate(task, outs, samples)
        if task == "classification":
            metric_state = M.cls_metrics_update(metric_state, agg, y)
        else:
            metric_state = M.reg_metrics_update(metric_state, agg[0],
                                                agg[1], y)
        return metric_state, agg

    return jax.jit(step, in_shardings=(rep, rep, data, data, key_sh),
                   out_shardings=(rep, rep))
