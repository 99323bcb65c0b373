"""Multi-device tests on the 8-device virtual CPU mesh: sharded training,
sharded MC eval, vmapped multi-seed fan-out."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.config import Config
from qbn_tpu.models.factory import build_model
from qbn_tpu.parallel.mesh import make_mesh, shard_batch
from qbn_tpu.parallel.sharded import make_sharded_train_step, \
    make_sharded_mc_eval
from qbn_tpu.parallel.sweep import (
    init_seed_states, make_vmapped_train_step, init_stacked_metrics,
)
from qbn_tpu.training.optim import build_optimizer
from qbn_tpu.training.trainer import make_train_step, TrainState, \
    _metrics_init
from qbn_tpu.training import metrics as M
from qbn_tpu.utils import init_variables

KEY = jax.random.PRNGKey(0)


def _state(model, cfg, tx, x):
    variables = init_variables(model, KEY, x,
                               quantized=bool(cfg.q or cfg.at))
    params = variables["params"]
    return TrainState(
        params=params,
        model_state={k: v for k, v in variables.items() if k != "params"},
        opt_state=tx.init(params), step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(1))


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_train_step_matches_single_device():
    cfg = Config(model="conv_resnet_bbb", dataset="cifar", sigma_prior=0.05,
                 gamma=0.01, batch_size=16, optimizer="adam",
                 lr_schedule="constant", learning_rate=1e-3)
    model = build_model(cfg)
    tx, _ = build_optimizer(cfg, 10)
    x = jax.random.uniform(jax.random.PRNGKey(2), (16, 32, 32, 3))
    y = jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 10)

    state = _state(model, cfg, tx, x)
    base = make_train_step(model, cfg, tx, "float", 10, 160)
    s1, m1, logs1 = base(state, _metrics_init(cfg.task), x, y)

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(model, cfg, tx, "float", 10, 160, mesh)
    xb, yb = shard_batch((x, y), mesh)
    s2, m2, logs2 = sharded(state, _metrics_init(cfg.task), xb, yb)

    assert np.isclose(float(logs1["obj"]), float(logs2["obj"]), rtol=1e-4)
    l1 = jax.tree.leaves(s1.params)[0]
    l2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_sharded_mc_eval_over_sample_axis():
    cfg = Config(model="conv_lenet_bbb", dataset="mnist", sigma_prior=0.1,
                 batch_size=8, samples=8)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (8, 28, 28, 1))
    y = jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 10)
    variables = init_variables(model, KEY, x)
    mesh = make_mesh(8, axis_names=("sample",))
    step = make_sharded_mc_eval(model, cfg, "float", mesh, samples=8)
    ms, agg = step(variables, M.cls_metrics_init(), x, y,
                   jax.random.PRNGKey(9))
    out = {k: float(v) for k, v in M.cls_metrics_compute(ms).items()}
    assert np.isfinite(out["nll"])
    assert agg.shape == (8, 10)
    np.testing.assert_allclose(np.asarray(agg).sum(-1), 1.0, rtol=1e-5)


def test_mesh_flow_matches_single_device(tmp_path):
    """End-to-end production flow with --mesh_shape 8 must produce metrics
    IDENTICAL to the single-device flow (sharding is placement, not math).
    Batch and samples divide the mesh, so every step takes the SPMD path."""
    import json
    import os
    from qbn_tpu.presets import preset
    from qbn_tpu.flows import setup_experiment, run_float_classification

    def run(mesh_shape, sub):
        cfg = preset("bbb", "mnist", "float").replace(
            epochs=2, batch_size=16, samples=8, debug=True,
            save=str(tmp_path / sub), seed=3, mesh_shape=mesh_shape,
            valid_portion=0.1)
        cfg = setup_experiment(cfg)
        run_float_classification(cfg)
        return json.load(open(os.path.join(cfg.save, "results.json")))

    single = run(None, "single")
    mesh = run((8,), "mesh")
    for metric in ("error", "nll", "ece", "entropy"):
        for split in ("test", "valid"):
            a, b = single[metric][split], mesh[metric][split]
            assert np.isclose(a, b, rtol=1e-5, atol=1e-6), (
                metric, split, a, b)


def test_vmapped_multi_seed_training():
    cfg = Config(model="linear", task="regression",
                 dataset="regression_synthetic", batch_size=64,
                 optimizer="adam", learning_rate=1e-2,
                 lr_schedule="constant", gamma=0.0)
    model = build_model(cfg)
    tx, _ = build_optimizer(cfg, 10)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 1))
    y = 2 * x + 8

    seeds = [1, 2, 3]
    states = init_seed_states(model, cfg, tx, x, seeds)
    step = make_vmapped_train_step(model, cfg, tx, "float", 10, 640)
    metrics = init_stacked_metrics(cfg, len(seeds))
    first = None
    for i in range(30):
        states, metrics, logs = step(states, metrics, x, y)
        if first is None:
            first = np.asarray(logs["obj"])
    last = np.asarray(logs["obj"])
    assert last.shape == (3,)
    assert np.all(last < first)
    # seeds actually differ
    p = np.asarray(jax.tree.leaves(states.params)[0])
    assert not np.allclose(p[0], p[1])
