"""Quantisation core unit tests, cross-checked against torch.ao.quantization
where available (the reference's backend) to pin observer / fake-quant
semantics (reference: src/quant_utils.py:112-147)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.quant import (
    UINT_BOUNDS, INT_BOUNDS,
    obs_init, obs_update, calculate_qparams,
    fake_quantize, quantize, dequantize, requantize,
    fuse_conv_bn_weights, softplusinv,
)
from qbn_tpu.quant.bounds import NOISE_SCALE

try:
    import torch
    from torch.ao.quantization.observer import MovingAverageMinMaxObserver
    HAVE_TORCH = True
except Exception:  # pragma: no cover
    HAVE_TORCH = False



pytestmark = pytest.mark.smoke

def test_bound_tables():
    assert UINT_BOUNDS[7] == (0, 127)
    assert UINT_BOUNDS[3] == (0, 7)
    assert INT_BOUNDS[8] == (-128, 127)
    assert INT_BOUNDS[3] == (-4, 3)
    assert abs(NOISE_SCALE - 3.0 / 127.0) < 1e-12


def test_observer_first_update_adopts_extrema():
    state = obs_init()
    x = jnp.array([-1.5, 0.2, 3.0])
    state = obs_update(state, x)
    assert np.isclose(state["min_val"], -1.5)
    assert np.isclose(state["max_val"], 3.0)


def test_observer_ema():
    state = obs_update(obs_init(), jnp.array([0.0, 1.0]))
    state = obs_update(state, jnp.array([0.0, 2.0]))
    # min: 0 + 0.01*(0-0) = 0 ; max: 1 + 0.01*(2-1) = 1.01
    assert np.isclose(state["max_val"], 1.01)


@pytest.mark.skipif(not HAVE_TORCH, reason="torch unavailable")
@pytest.mark.parametrize("bits,signed", [(8, False), (7, False), (4, False),
                                         (8, True), (5, True)])
def test_observer_qparams_match_torch(bits, signed):
    lo, hi = (INT_BOUNDS if signed else UINT_BOUNDS)[bits]
    dtype = torch.qint8 if signed else torch.quint8
    tobs = MovingAverageMinMaxObserver(
        averaging_constant=0.01, dtype=dtype,
        qscheme=torch.per_tensor_affine, quant_min=lo, quant_max=hi)
    state = obs_init()
    rng = np.random.RandomState(0)
    for _ in range(5):
        x = rng.randn(64).astype(np.float32) * 2.0 + 0.3
        tobs(torch.from_numpy(x))
        state = obs_update(state, jnp.asarray(x))
    t_scale, t_zp = tobs.calculate_qparams()
    scale, zp = calculate_qparams(state["min_val"], state["max_val"], lo, hi)
    assert np.isclose(float(scale), float(t_scale), rtol=1e-5)
    assert int(zp) == int(t_zp)


@pytest.mark.skipif(not HAVE_TORCH, reason="torch unavailable")
@pytest.mark.parametrize("bits,signed", [(8, False), (7, False), (3, False),
                                         (8, True), (4, True)])
def test_fake_quant_matches_torch(bits, signed):
    lo, hi = (INT_BOUNDS if signed else UINT_BOUNDS)[bits]
    rng = np.random.RandomState(1)
    x = rng.randn(256).astype(np.float32)
    scale, zp = 0.037, (0 if signed else min(11, hi))
    t = torch.fake_quantize_per_tensor_affine(
        torch.from_numpy(x), scale, zp, lo, hi).numpy()
    j = np.asarray(fake_quantize(jnp.asarray(x), scale, zp, lo, hi))
    np.testing.assert_allclose(j, t, atol=1e-6)


def test_fake_quant_ste_gradient():
    scale, zp, lo, hi = 0.1, 0, -4, 3
    g = jax.grad(lambda x: jnp.sum(fake_quantize(x, scale, zp, lo, hi)))
    x = jnp.array([0.05, -0.3, 10.0, -10.0])  # last two out of range
    gx = np.asarray(g(x))
    np.testing.assert_allclose(gx, [1.0, 1.0, 0.0, 0.0])


def test_quantize_dequantize_roundtrip():
    x = jnp.array([-0.5, 0.0, 0.49, 1.2])
    q = quantize(x, 0.01, 0, -128, 127)
    assert q.dtype == jnp.int8
    xd = dequantize(q, 0.01, 0)
    np.testing.assert_allclose(np.asarray(xd), [-0.5, 0.0, 0.49, 1.2],
                               atol=1e-6)
    # clamp at qmax: 2.0 -> code 127 -> 1.27
    q2 = quantize(jnp.array([2.0]), 0.01, 0, -128, 127)
    assert int(q2[0]) == 127


def test_requantize():
    q = quantize(jnp.array([0.3]), 0.01, 0, -128, 127)
    r = requantize(q, 0.01, 0, 0.02, 5, 0, 255, dtype=jnp.int32)
    # 0.3 -> code 30 @ s=.01 -> value .3 -> code round(.3/.02)+5 = 20
    assert int(r[0]) == 20


def test_softplusinv_roundtrip():
    x = jnp.array([-10.0, -3.0, 0.5, 2.0])
    sp = jnp.logaddexp(x, 0.0)
    np.testing.assert_allclose(np.asarray(softplusinv(sp)), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not HAVE_TORCH, reason="torch unavailable")
def test_bn_fold_matches_reference_formula():
    """Fold must equal torch BN applied after the conv (eval mode), and the
    std co-fold must satisfy softplus(std') = softplus(std) * c
    (reference: src/models/stochastic/bbb/conv.py:70-80)."""
    rng = np.random.RandomState(2)
    kh = kw = 3
    cin, cout = 4, 6
    w = rng.randn(kh, kw, cin, cout).astype(np.float32) * 0.1
    std = rng.uniform(-5, -2, (kh, kw, cin, cout)).astype(np.float32)
    rm = rng.randn(cout).astype(np.float32) * 0.1
    rv = rng.uniform(0.5, 2.0, cout).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    beta = rng.randn(cout).astype(np.float32) * 0.1
    eps = 1e-5

    fw, fb, fstd = fuse_conv_bn_weights(
        jnp.asarray(w), None, jnp.asarray(std), jnp.asarray(rm),
        jnp.asarray(rv), eps, jnp.asarray(gamma), jnp.asarray(beta))

    c = gamma / np.sqrt(rv + eps)
    np.testing.assert_allclose(np.asarray(fw), w * c, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fb), (0 - rm) / np.sqrt(rv + eps)
                               * gamma + beta, rtol=1e-5)
    sp = np.logaddexp(std, 0.0)
    np.testing.assert_allclose(np.asarray(jnp.logaddexp(fstd, 0.0)),
                               sp * c, rtol=1e-3)  # f32 softplus round trip
