"""MC evaluation engine + harness tests (reference semantics:
experiments/utils.py:330-377 sample averaging and variance decomposition,
models_sgld.py round-robin -> stacked-vmap equivalence)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.config import Config
from qbn_tpu.data import get_train_loaders, get_test_loader
from qbn_tpu.evaluation.mc import mc_predict, aggregate, \
    evaluate_with_loader
from qbn_tpu.evaluation.ensemble import stack_variables, load_ensemble
from qbn_tpu.evaluation.harness import (
    evaluate_classification_uncertainty, evaluate_regression_uncertainty,
)
from qbn_tpu.evaluation.results import init_results
from qbn_tpu.models.factory import build_model
from qbn_tpu.training.checkpoint import save_variables, checkpoint_path
from qbn_tpu.utils import init_variables, split_rngs

KEY = jax.random.PRNGKey(0)


def test_mc_predict_matches_sequential_loop():
    """vmapped MC == the reference's sequential per-sample loop, same keys."""
    cfg = Config(model="conv_lenet_bbb", sigma_prior=0.1, output_size=10,
                 samples=4)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 28, 28, 1))
    variables = init_variables(model, KEY, x)
    key = jax.random.PRNGKey(5)
    outs = mc_predict(model, variables, x, key, samples=4, mode="float")
    keys = jax.random.split(key, 4)
    seq = []
    for k in keys:
        o, _ = model.apply(variables, x, train=False, mode="float",
                           update_stats=False, rngs=split_rngs(k),
                           mutable=["kl"])
        seq.append(np.asarray(o))
    np.testing.assert_allclose(np.asarray(outs), np.stack(seq), atol=1e-5)


def test_regression_aggregation_unbiased_variance():
    mu = jnp.asarray(np.random.RandomState(0).randn(5, 3, 1))
    var = jnp.abs(jnp.asarray(np.random.RandomState(1).randn(5, 3, 1)))
    mean, total = aggregate("regression", (mu, var), samples=5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mu).mean(0),
                               rtol=1e-6)
    expect = np.asarray(mu).var(0, ddof=1) + np.asarray(var).mean(0)
    np.testing.assert_allclose(np.asarray(total), expect, rtol=1e-5)


def test_ensemble_stack_and_predict():
    """Stacked-params vmap equals the per-member loop average."""
    cfg = Config(model="linear_sgld", task="regression", output_size=1,
                 samples=3)
    model = build_model(cfg)
    x = jnp.ones((4, 5))
    members = [init_variables(model, jax.random.PRNGKey(i), x)
               for i in range(3)]
    stacked = stack_variables(members)
    outs = mc_predict(model, stacked, x, KEY, samples=3, mode="float",
                      ensemble=True)
    mean, var = aggregate("regression", outs, samples=3)
    per = [np.asarray(model.apply(m, x, train=False, mode="float",
                                  rngs=split_rngs(KEY), mutable=["kl"])[0][0])
           for m in members]
    np.testing.assert_allclose(np.asarray(mean), np.stack(per).mean(0),
                               atol=1e-5)


def test_classification_harness_debug(tmp_path):
    cfg = Config(model="conv_lenet_mc", dataset="mnist", p=0.2,
                 batch_size=64, samples=3, debug=True, save=str(tmp_path),
                 data="./data", valid_portion=0.1, output_size=10)
    model = build_model(cfg)
    x = jnp.ones((2, 28, 28, 1))
    variables = init_variables(model, KEY, x)
    results = evaluate_classification_uncertainty(model, variables, cfg,
                                                  mode="float")
    for split in ("train", "valid", "test", "random"):
        assert split in results["error"], split
    assert "rotation" in results["error"]
    assert os.path.exists(os.path.join(tmp_path, "results.json"))
    assert results["latency"]["test"] > 0


def test_regression_harness_synthetic_only(tmp_path):
    cfg = Config(model="linear", task="regression",
                 dataset="regression_synthetic", batch_size=100, samples=1,
                 save=str(tmp_path), valid_portion=0.2, debug=True,
                 input_size=(1,))
    model = build_model(cfg)
    x = jnp.ones((2, 1))
    variables = init_variables(model, KEY, x)
    save_variables(variables, checkpoint_path(str(tmp_path),
                                              "_synthetic_0"))
    results = evaluate_regression_uncertainty(
        cfg, mode="float", datasets=[("synthetic", 1)])
    assert "regression_synthetic" in results["error"]
    assert np.isfinite(results["error"]["regression_synthetic"]["test"])
    assert os.path.exists(os.path.join(tmp_path, "regression.png"))
