"""Merged-channel-layout INT MC path (MergedQTensor): bitwise equivalence.

The merged path computes every posterior sample in ONE forward with
activations in (B, H, W, S*C) layout (feature-grouped convs / batched
dense) instead of vmapping the model over samples. Same presampled
weights + identical requant arithmetic => the int8 activation codes, and
therefore the dequantised logits, must be BITWISE equal to the vmapped
formulation on every architecture.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.config import Config
from qbn_tpu.evaluation.mc import mc_predict, presample_plan
from qbn_tpu.models.factory import build_model
from qbn_tpu.utils import init_variables, apply_model, convert_model

KEY = jax.random.PRNGKey(0)


def _converted(model_name, x, **cfg_kw):
    cfg = Config(model=model_name, sigma_prior=0.1, at=True, q=True,
                 **cfg_kw)
    model = build_model(cfg)
    variables = init_variables(model, KEY, x, quantized=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=True,
                                  mode="qat", update_stats=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=False,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, KEY)
    return cfg, model, variables


@pytest.mark.parametrize("model_name,shape,kw", [
    ("conv_lenet_bbb", (4, 28, 28, 1), dict(output_size=10)),
    ("conv_resnet_bbb", (2, 32, 32, 3), dict(output_size=10)),
])
def test_merged_matches_vmapped_bitwise(model_name, shape, kw):
    x = jax.random.uniform(jax.random.PRNGKey(2), shape)
    cfg, model, variables = _converted(model_name, x, **kw)
    plan = presample_plan(variables)
    assert plan is not None
    key = jax.random.PRNGKey(7)
    out_v = mc_predict(model, variables, x, key, samples=3, mode="int",
                       plan=plan, merged=False)
    out_m = mc_predict(model, variables, x, key, samples=3, mode="int",
                       plan=plan, merged=True)
    assert out_m.shape == out_v.shape == (3, shape[0], 10)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(out_v))
    if model_name == "conv_lenet_bbb":
        # samples genuinely differ (the untrained converted ResNet
        # quantises every logit into one bucket — see bench.py notes)
        assert np.abs(np.asarray(out_m[0]) - np.asarray(out_m[1])).max() > 0


def test_merged_regression_heads_bitwise():
    x = jax.random.uniform(jax.random.PRNGKey(4), (5, 6))
    cfg, model, variables = _converted(
        "linear_bbb", x, task="regression", output_size=1, input_size=(6,))
    plan = presample_plan(variables)
    assert plan is not None
    key = jax.random.PRNGKey(9)
    mu_v, var_v = mc_predict(model, variables, x, key, samples=4,
                             mode="int", plan=plan, merged=False)
    mu_m, var_m = mc_predict(model, variables, x, key, samples=4,
                             mode="int", plan=plan, merged=True)
    assert mu_m.shape == mu_v.shape == (4, 5, 1)
    np.testing.assert_array_equal(np.asarray(mu_m), np.asarray(mu_v))
    np.testing.assert_array_equal(np.asarray(var_m), np.asarray(var_v))
