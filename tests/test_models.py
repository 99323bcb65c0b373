"""Model zoo tests: shapes, stochastic semantics, QAT observers, conversion,
and integer-path agreement (reference behaviours from
src/models/stochastic/bbb/* and src/models/pointwise/models_p.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.config import Config
from qbn_tpu.models.factory import build_model
from qbn_tpu.models.layers import QuantConfig, DenseBlock, BernoulliDropout
from qbn_tpu.utils import init_variables, apply_model, convert_model, sum_kl
from qbn_tpu.ops.stochastic import kl_divergence, softplus


KEY = jax.random.PRNGKey(0)


def _cfg(model, **kw):
    base = dict(model=model, sigma_prior=0.1, p=0.2, output_size=10)
    base.update(kw)
    return Config(**base)


# ---------------------------------------------------------------------------
# Float forward shapes for every (arch x method)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("arch,inp", [
    ("linear", (4, 13)),
    ("conv_lenet", (2, 28, 28, 1)),
    ("conv_resnet", (2, 32, 32, 3)),
])
@pytest.mark.parametrize("method", ["", "_mc", "_bbb", "_sgld"])
def test_float_forward_shapes(arch, inp, method):
    cfg = _cfg(arch + method)
    model = build_model(cfg)
    x = jnp.ones(inp, jnp.float32)
    variables = init_variables(model, KEY, x)
    out, kl, _ = apply_model(model, variables, x, KEY, train=False,
                             mode="float")
    if arch == "linear":
        mu, var = out
        assert mu.shape == (inp[0], 1) and var.shape == (inp[0], 1)
        assert np.all(np.asarray(var) > 0)
    else:
        assert out.shape == (inp[0], 10)
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)
    if method == "_bbb":
        assert float(kl) > 0.0
    else:
        assert float(kl) == 0.0


def test_bbb_kl_matches_closed_form():
    """KL sow'n by the model equals the closed form over its layers."""
    cfg = _cfg("linear_bbb")
    model = build_model(cfg)
    x = jnp.ones((2, 13))
    variables = init_variables(model, KEY, x)
    _, kl, _ = apply_model(model, variables, x, KEY, train=True,
                           mode="float")
    expect = 0.0
    for name, p in variables["params"].items():
        if "std" in p:
            expect += kl_divergence(
                p["kernel"], softplus(p["std"]),
                jnp.zeros_like(p["kernel"]),
                jnp.full_like(p["std"], cfg.sigma_prior))
    assert np.isclose(float(kl), float(expect), rtol=1e-5)


def test_bbb_local_reparam_moments():
    """Training-mode output must have mean x@w and var x^2 @ softplus(std)^2
    (reference: bbb/linear.py:32-40)."""
    block = DenseBlock(8, use_bias=False, stochastic=True, sigma_prior=1.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    variables = block.init({"params": KEY, "noise": KEY}, x, train=True)
    w = variables["params"]["kernel"]
    sp = softplus(variables["params"]["std"])

    keys = jax.random.split(jax.random.PRNGKey(10), 3000)
    outs = np.asarray(jax.vmap(
        lambda k: block.apply(variables, x, train=True, rngs={"noise": k})
    )(keys))
    np.testing.assert_allclose(outs.mean(0), np.asarray(x @ w),
                               atol=4 * float(sp.max()) / np.sqrt(3000) * 5)
    expect_var = np.asarray((x ** 2) @ (sp ** 2))
    np.testing.assert_allclose(outs.var(0), expect_var, rtol=0.25,
                               atol=1e-6)


def test_bbb_eval_shares_weight_across_batch():
    """Eval mode samples ONE weight per forward: identical rows in must give
    identical rows out (train mode must not)."""
    block = DenseBlock(8, use_bias=False, stochastic=True)
    x = jnp.ones((4, 16))
    variables = block.init({"params": KEY, "noise": KEY}, x, train=False)
    y_eval = block.apply(variables, x, train=False,
                         rngs={"noise": jax.random.PRNGKey(7)})
    assert np.allclose(np.asarray(y_eval[0]), np.asarray(y_eval[1]))
    y_train = block.apply(variables, x, train=True,
                          rngs={"noise": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(y_train[0]), np.asarray(y_train[1]))


def test_mc_dropout_active_at_eval_and_per_channel():
    """MC-Dropout masks at eval time, per-(sample, channel) on conv inputs
    (reference: mcdropout/dropout.py:15-40)."""
    drop = BernoulliDropout(p=0.5)
    x = jnp.ones((2, 8, 8, 16))
    variables = drop.init({"params": KEY, "dropout": KEY}, x)
    y = drop.apply(variables, x, rngs={"dropout": jax.random.PRNGKey(3)})
    y = np.asarray(y)
    assert set(np.unique(y.round(4))) <= {0.0, 2.0}
    # spatial positions within one (sample, channel) share the mask
    per_chan = y[:, :, :, :].std(axis=(1, 2))
    np.testing.assert_allclose(per_chan, 0.0, atol=1e-6)
    # masking differs across samples/channels with overwhelming probability
    assert y.std() > 0


# ---------------------------------------------------------------------------
# QAT / conversion / integer path
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("model_name", ["conv_lenet", "conv_lenet_bbb",
                                        "conv_lenet_mc"])
def test_qat_convert_int_pipeline(model_name):
    cfg = _cfg(model_name, at=True, q=True,
               activation_precision=7, weight_precision=8)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 28, 28, 1))
    variables = init_variables(model, KEY, x, quantized=True)

    # a few QAT passes to calibrate observers (train + eval branches)
    for i in range(3):
        out, kl, variables = apply_model(
            model, variables, x, jax.random.PRNGKey(i), train=True,
            mode="qat", update_stats=True)
        out, kl, variables = apply_model(
            model, variables, x, jax.random.PRNGKey(100 + i), train=False,
            mode="qat", update_stats=True)
    assert out.shape == (4, 10)

    variables = convert_model(model, variables, x, KEY)
    qc = variables["qconst"]
    leaves = jax.tree_util.tree_leaves(qc)
    assert any(l.dtype == jnp.int8 and l.size > 1 for l in leaves)

    out_int, _, _ = apply_model(model, variables, x, jax.random.PRNGKey(9),
                                train=False, mode="int")
    assert out_int.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(out_int.sum(-1)), 1.0, rtol=1e-4)

    # INT forward should be in the same ballpark as the QAT-eval forward
    out_qat, _, _ = apply_model(model, variables, x, jax.random.PRNGKey(9),
                                train=False, mode="qat")
    assert np.mean(np.abs(np.asarray(out_int) - np.asarray(out_qat))) < 0.2


def test_int_path_resnet_runs():
    cfg = _cfg("conv_resnet_bbb", at=True, q=True)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    variables = init_variables(model, KEY, x, quantized=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=True,
                                  mode="qat", update_stats=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=False,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, KEY)
    out, _, _ = apply_model(model, variables, x, KEY, train=False,
                            mode="int")
    assert out.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sub8bit_weight_codes_respect_bounds():
    cfg = _cfg("conv_lenet", at=True, q=True, weight_precision=4,
               activation_precision=4)
    model = build_model(cfg)
    x = jax.random.uniform(KEY, (2, 28, 28, 1))
    variables = init_variables(model, KEY, x, quantized=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=True,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, KEY)

    def check(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                check(v)
            elif k == "w_codes":
                assert int(jnp.max(v)) <= 7 and int(jnp.min(v)) >= -8
    check(variables["qconst"])
