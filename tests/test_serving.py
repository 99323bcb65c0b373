"""Serving-export tests: the jax.export artifact reproduces the live
predictor bitwise after a serialize/deserialize round trip, covers the
INT path and regression aggregation, and cross-lowers for TPU from this
CPU host (the build-host-emits-TPU-artifact property)."""

import numpy as np
import jax
import jax.numpy as jnp

from qbn_tpu.config import Config
from qbn_tpu.models.factory import build_model
from qbn_tpu.serving import export_predictor, load_predictor, make_predictor
from qbn_tpu.utils import apply_model, convert_model, init_variables

KEY = jax.random.PRNGKey(0)


def _cfg(model, **kw):
    base = dict(model=model, sigma_prior=0.1, p=0.2, output_size=10)
    base.update(kw)
    return Config(**base)


def _int_model(model_name, inp, **kw):
    cfg = _cfg(model_name, at=True, q=True, **kw)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), inp)
    variables = init_variables(model, KEY, x, quantized=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=True,
                                  mode="qat", update_stats=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=False,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, KEY)
    return cfg, model, variables, x


def test_export_roundtrip_bitwise_float(tmp_path):
    cfg = _cfg("conv_lenet_bbb", samples=4)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 28, 28, 1))
    variables = init_variables(model, KEY, x)

    fn = make_predictor(model, variables, cfg, mode="float")
    direct = np.asarray(fn(x, jnp.asarray(7, jnp.int32)))

    export_predictor(model, variables, cfg, mode="float", batch=2,
                     input_shape=(28, 28, 1), path=str(tmp_path))
    loaded = load_predictor(str(tmp_path))
    served = np.asarray(loaded.call(x, 7))

    # AOT deserialized programs compile with different backend codegen
    # preferences than the live jit (observed: XLA:CPU AOT sets
    # prefer-no-gather/scatter) — float math may drift ULPs; the INT
    # path below stays bitwise.
    np.testing.assert_allclose(served, direct, rtol=1e-5, atol=1e-6)
    assert loaded.manifest["task"] == "classification"
    assert loaded.manifest["samples"] == 4
    assert loaded.manifest["weights_mb"] > 0


def test_export_roundtrip_bitwise_int(tmp_path):
    cfg, model, variables, x = _int_model("conv_lenet_bbb",
                                          (2, 28, 28, 1), samples=2)
    fn = make_predictor(model, variables, cfg, mode="int")
    direct = np.asarray(fn(x, jnp.asarray(11, jnp.int32)))

    export_predictor(model, variables, cfg, mode="int", batch=2,
                     input_shape=(28, 28, 1), path=str(tmp_path))
    served = np.asarray(load_predictor(str(tmp_path)).call(x, 11))

    np.testing.assert_array_equal(served, direct)
    # probabilities: rows sum to 1
    np.testing.assert_allclose(served.sum(-1), 1.0, rtol=1e-5)


def test_export_regression_mean_var(tmp_path):
    cfg = _cfg("linear_bbb", task="regression", dataset="regression_synthetic",
               output_size=1, samples=4)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5), (8, 1))
    variables = init_variables(model, KEY, x)

    fn = make_predictor(model, variables, cfg, mode="float")
    d_mean, d_var = map(np.asarray, fn(x, jnp.asarray(1, jnp.int32)))

    export_predictor(model, variables, cfg, mode="float", batch=8,
                     input_shape=(1,), path=str(tmp_path))
    s_mean, s_var = map(np.asarray,
                        load_predictor(str(tmp_path)).call(x, 1))

    np.testing.assert_allclose(s_mean, d_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_var, d_var, rtol=1e-5, atol=1e-6)
    assert np.all(s_var > 0)


def test_freeze_draws_fixed_sample_bank(tmp_path):
    """--freeze_draws bakes the posterior sample bank in as constants:
    the served outputs match mc_predict on the same eagerly-drawn codes,
    are seed-independent for BBB (all randomness was in the weights), and
    round-trip through the artifact bitwise."""
    from qbn_tpu.evaluation.mc import (aggregate, draw_sampled_weights,
                                       mc_predict, presample_plan)

    cfg, model, variables, x = _int_model("conv_lenet_bbb",
                                          (2, 28, 28, 1), samples=4)
    plan = presample_plan(variables)
    frozen = draw_sampled_weights(variables, plan, jax.random.PRNGKey(3), 4)
    outs = mc_predict(model, variables, x, jax.random.PRNGKey(11),
                      samples=4, mode="int", plan=plan, presampled=frozen)
    expected = np.asarray(aggregate("classification", outs, 4))

    fn = make_predictor(model, variables, cfg, mode="int", use_plan=True,
                        freeze_draws=3)
    got_a = np.asarray(fn(x, jnp.asarray(11, jnp.int32)))
    got_b = np.asarray(fn(x, jnp.asarray(99, jnp.int32)))
    np.testing.assert_array_equal(got_a, expected)
    np.testing.assert_array_equal(got_a, got_b)  # fixed bank: no per-call RNG

    export_predictor(model, variables, cfg, mode="int", batch=2,
                     input_shape=(28, 28, 1), path=str(tmp_path),
                     use_plan=True, freeze_draws=3)
    loaded = load_predictor(str(tmp_path))
    assert loaded.manifest["freeze_draws"] == 3
    np.testing.assert_array_equal(np.asarray(loaded.call(x, 11)), expected)


def test_freeze_draws_chunked_matches_unchunked(tmp_path):
    """Chunked consumption of the frozen bank equals the unchunked path."""
    cfg, model, variables, x = _int_model("conv_lenet_bbb",
                                          (2, 28, 28, 1), samples=4)
    whole = make_predictor(model, variables, cfg, mode="int",
                           use_plan=True, freeze_draws=5)
    chunked = make_predictor(model, variables, cfg, mode="int",
                             use_plan=True, chunk=2, freeze_draws=5)
    a = np.asarray(whole(x, jnp.asarray(1, jnp.int32)))
    b = np.asarray(chunked(x, jnp.asarray(1, jnp.int32)))
    np.testing.assert_array_equal(a, b)


def test_export_tpu_artifact_from_cpu_host(tmp_path):
    """Cross-platform lowering: a TPU serving artifact — including the
    production fused-draw + merged-channel INT formulation (Pallas
    tpu_custom_call) — serializes on this CPU-only host."""
    cfg, model, variables, _ = _int_model("conv_lenet_bbb",
                                          (2, 28, 28, 1), samples=4)
    blob = export_predictor(model, variables, cfg, mode="int", batch=2,
                            input_shape=(28, 28, 1), path=str(tmp_path),
                            use_plan=True, chunk=2, platforms=("tpu",))
    manifest = load_predictor(str(tmp_path)).manifest
    assert manifest["platforms"] == ["tpu"]
    import os
    assert os.path.getsize(blob) > 1000
