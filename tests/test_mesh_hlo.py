"""HLO-level collective-placement regression tests for the SPMD paths.

The mesh ≡ single-device equivalence test (test_mesh.py) proves the math;
these tests pin the COMPILED collective structure so a sharding regression
(e.g. a replicated batch silently making every device compute the full
batch, or gradients no longer being averaged across the data axis) is
caught without multi-chip hardware. Counts are from XLA's optimized HLO
on the 8-virtual-device CPU mesh (conftest.py provisions it).

Reference mandate: SURVEY.md §5 distributed-equivalent; VERDICT r2 #8.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.config import Config
from qbn_tpu.models.factory import build_model
from qbn_tpu.parallel.mesh import make_mesh
from qbn_tpu.parallel.sharded import (make_sharded_mc_eval,
                                      make_sharded_train_step)
from qbn_tpu.training import metrics as M
from qbn_tpu.training.optim import build_optimizer
from qbn_tpu.training.trainer import TrainState, _metrics_init
from qbn_tpu.utils import init_variables

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh")


def _collective_counts(hlo_text: str):
    return {op: len(re.findall(rf"\b{op}(?:-start)?\(", hlo_text))
            for op in ("all-reduce", "all-gather", "reduce-scatter",
                       "collective-permute", "all-to-all")}


def _tiny_setup():
    cfg = Config(model="conv_lenet_bbb", dataset="mnist",
                 input_size=(28, 28, 1), output_size=10, batch_size=16,
                 optimizer="adam", lr_schedule="constant", gamma=0.1)
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((16, 28, 28, 1), jnp.float32)
    variables = init_variables(model, key, x)
    return cfg, model, variables, x


def test_dp_train_step_collectives():
    cfg, model, variables, x = _tiny_setup()
    y = jnp.zeros((16,), jnp.int32)
    tx, _ = build_optimizer(cfg, 1)
    mesh = make_mesh(8)
    step = make_sharded_train_step(model, cfg, tx, "float", 1, 16, mesh)
    state = TrainState(
        params=variables["params"],
        model_state={k: v for k, v in variables.items() if k != "params"},
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(1))
    txt = step.lower(state, _metrics_init(cfg.task), x, y) \
        .compile().as_text()

    assert "num_partitions=8" in txt
    counts = _collective_counts(txt)
    # gradient averaging over the data axis: XLA coalesces every grad leaf
    # (and the metric sums) into ONE fused all-reduce; zero would mean the
    # batch is no longer sharded (each device computing the full batch)
    assert counts["all-reduce"] >= 1, counts
    # the replicated-out TrainState must not be rebuilt by broadcasting
    # per-device partial results through repeated gathers: the only
    # all-gather is the output-layout one
    assert counts["all-gather"] <= 2, counts
    # nothing in the DP step should need a permute / all-to-all
    assert counts["collective-permute"] == 0, counts
    assert counts["all-to-all"] == 0, counts


def test_sample_sharded_mc_eval_collectives():
    cfg, model, variables, x = _tiny_setup()
    cfg = cfg.replace(samples=8)
    y = jnp.zeros((16,), jnp.int32)
    mesh = make_mesh(8, axis_names=("sample",))
    step = make_sharded_mc_eval(model, cfg, "float", mesh, samples=8)
    ms = M.cls_metrics_init()
    txt = step.lower(variables, ms, x, y,
                     jax.random.PRNGKey(0)).compile().as_text()

    assert "num_partitions=8" in txt
    counts = _collective_counts(txt)
    # the per-device MC chunks concatenate over the sample axis
    # (out_specs=P('sample')) and the predictive mean reduces over it:
    # at least one gather-or-reduce collective must appear
    assert counts["all-gather"] + counts["all-reduce"] >= 1, counts
    assert counts["all-to-all"] == 0, counts
