"""MC evaluation on the INT path for MC-Dropout: per-sample dropout masks
must differ under the vmapped sample axis and produce valid probabilities."""

import numpy as np
import jax
import jax.numpy as jnp

from qbn_tpu.config import Config
from qbn_tpu.evaluation.mc import mc_predict, aggregate
from qbn_tpu.models.factory import build_model
from qbn_tpu.utils import init_variables, apply_model, convert_model

KEY = jax.random.PRNGKey(0)


def test_mcdropout_int_mc_eval():
    cfg = Config(model="conv_lenet_mc", p=0.3, at=True, q=True,
                 output_size=10, samples=6)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 28, 28, 1))
    variables = init_variables(model, KEY, x, quantized=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=True,
                                  mode="qat", update_stats=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=False,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, KEY)

    outs = mc_predict(model, variables, x, jax.random.PRNGKey(2),
                      samples=6, mode="int")
    outs = np.asarray(outs)
    assert outs.shape == (6, 2, 10)
    # different dropout masks per sample -> different outputs
    assert not np.allclose(outs[0], outs[1])
    probs = np.asarray(aggregate("classification", jnp.asarray(outs), 6))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
