"""Presampled INT MC path: the bulk posterior draw (Pallas on TPU, oracle
elsewhere) must be distributionally consistent with the inline per-sample
draw and produce valid predictive outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.config import Config
from qbn_tpu.evaluation.mc import (
    mc_predict, presample_plan, draw_sampled_weights, aggregate,
)
from qbn_tpu.models.factory import build_model
from qbn_tpu.utils import init_variables, apply_model, convert_model

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def converted_lenet():
    cfg = Config(model="conv_lenet_bbb", sigma_prior=0.1, at=True, q=True,
                 output_size=10)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 28, 28, 1))
    variables = init_variables(model, KEY, x, quantized=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=True,
                                  mode="qat", update_stats=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=False,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, KEY)
    return cfg, model, variables, x


def test_plan_finds_stochastic_blocks(converted_lenet):
    _, _, variables, _ = converted_lenet
    plan = presample_plan(variables)
    assert plan is not None and len(plan) == 4  # 2 convs + 2 denses
    for path, lo, hi in plan:
        assert lo == -128 and hi == 127


def test_plan_none_for_pointwise():
    cfg = Config(model="conv_lenet", at=True, q=True, output_size=10)
    model = build_model(cfg)
    x = jnp.ones((2, 28, 28, 1))
    variables = init_variables(model, KEY, x, quantized=True)
    assert presample_plan(variables) is None


def test_draw_shapes_and_bounds(converted_lenet):
    _, _, variables, _ = converted_lenet
    plan = presample_plan(variables)
    sampled = draw_sampled_weights(variables, plan, KEY, samples=3)
    leaves = jax.tree_util.tree_leaves(sampled)
    assert all(l.shape[0] == 3 and l.dtype == jnp.int8 for l in leaves)
    assert len(leaves) == 4


def test_presampled_predictions_close_to_inline(converted_lenet):
    cfg, model, variables, x = converted_lenet
    plan = presample_plan(variables)
    S = 16
    outs_pre = mc_predict(model, variables, x, jax.random.PRNGKey(3),
                          samples=S, mode="int", plan=plan)
    outs_inline = mc_predict(model, variables, x, jax.random.PRNGKey(3),
                             samples=S, mode="int")
    p1 = np.asarray(aggregate("classification", outs_pre, S))
    p2 = np.asarray(aggregate("classification", outs_inline, S))
    assert p1.shape == p2.shape == (4, 10)
    np.testing.assert_allclose(p1.sum(-1), 1.0, rtol=1e-5)
    # same posterior, different RNG streams: predictive means agree to MC
    # error (untrained net => near-uniform probabilities)
    assert np.abs(p1 - p2).max() < 0.25
