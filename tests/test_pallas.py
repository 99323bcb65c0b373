"""Pallas kernel tests against exact XLA oracles (explicit-noise variants;
TPU interpret mode on CPU — its on-chip PRNG is exercised on real TPU by
bench/graft runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.ops.pallas.sample_weights import (
    draw_all_layers, draw_flat, flat_rows, pack_layers,
    sample_weights_int8, sample_weights_oracle,
)
from qbn_tpu.ops.pallas.bbb_dense import local_reparam_dense_fused
from qbn_tpu.ops.stochastic import local_reparam_dense


QP = dict(w_scale=0.01, w_zp=0, std_scale=0.002, std_zp=-10,
          mul_scale=0.004, mul_zp=0, add_scale=0.012, add_zp=1)


def test_sample_weights_matches_oracle_exactly():
    m, n, s = 32, 128, 8
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randint(-100, 100, (m, n)).astype(np.int8))
    std = jnp.asarray(rng.randint(20, 60, (m, n)).astype(np.int8))
    noise = jnp.asarray(rng.randn(s, m, n).astype(np.float32))
    out = np.asarray(sample_weights_int8(
        w, std, QP, seed=0, samples=s, w_lo=-128, w_hi=127, noise=noise,
        interpret=True))
    expect = np.asarray(sample_weights_oracle(w, std, QP, noise,
                                              -128, 127))
    # the TPU (and its interpreter) computes f32 division via reciprocal
    # approximation, so values on a rounding boundary may land one code
    # away from the XLA-CPU oracle — same class of difference as FBGEMM's
    # requant rounding mode. Require <= 1 code on a small fraction.
    diff = out.astype(np.int32) - expect.astype(np.int32)
    assert np.abs(diff).max() <= 1
    assert (diff != 0).mean() < 0.05
    # the noise actually moves codes around
    assert np.std(out.astype(np.float32), axis=0).mean() > 0.5


def test_sample_weights_respects_sub8bit_bounds():
    m, n, s = 32, 128, 4
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randint(-100, 100, (m, n)).astype(np.int8))
    std = jnp.asarray(rng.randint(30, 80, (m, n)).astype(np.int8))
    noise = jnp.asarray(rng.randn(s, m, n).astype(np.float32) * 2)
    out = np.asarray(sample_weights_int8(
        w, std, QP, seed=0, samples=s, w_lo=-8, w_hi=7, noise=noise,
        interpret=True))
    assert out.min() >= -8 and out.max() <= 7


def test_draw_flat_bookkeeping_bitwise():
    """The lane-packed layout (draw_flat) must emit byte-identical codes
    to the oracle on the original (m, n) layout when fed the same noise:
    pad -> kernel -> slice is pure bookkeeping."""
    m, n, s = 216, 24, 4           # a stage-0 conv shape: 5184 % 512 != 0
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randint(-100, 100, (m, n)).astype(np.int8))
    std = jnp.asarray(rng.randint(20, 60, (m, n)).astype(np.int8))
    rows = flat_rows(m, n)
    assert rows == 11  # 5184 -> 11 rows of 512 (pad 448)
    noise_flat = rng.randn(s, rows, 512).astype(np.float32)
    out = np.asarray(draw_flat(w, std, QP, seed=0, samples=s,
                               w_lo=-128, w_hi=127,
                               noise=jnp.asarray(noise_flat),
                               interpret=True))
    # oracle on the original layout with the identical noise values
    noise_orig = noise_flat.reshape(s, -1)[:, :m * n].reshape(s, m, n)
    expect = np.asarray(sample_weights_oracle(
        w, std, QP, jnp.asarray(noise_orig), -128, 127))
    diff = out.astype(np.int32) - expect.astype(np.int32)
    assert np.abs(diff).max() <= 1          # reciprocal-division rounding
    assert (diff != 0).mean() < 0.05
    assert out.shape == (s, m, n)


def test_draw_all_layers_matches_per_layer_oracle():
    """The whole-model fused draw (per-row qparams, packed rows) must
    match the per-layer oracle on every layer given the same noise."""
    rng = np.random.RandomState(4)
    s = 2
    shapes = [(27, 24), (216, 24), (1728, 192), (192, 10)]
    layers, qps, bounds = [], [], []
    for j, (m, n) in enumerate(shapes):
        w = jnp.asarray(rng.randint(-100, 100, (m, n)).astype(np.int8))
        std = jnp.asarray(rng.randint(20, 60, (m, n)).astype(np.int8))
        qp = {k: v * (1.0 + 0.1 * j) if isinstance(v, float) else v
              for k, v in QP.items()}
        lo, hi = (-128, 127) if j % 2 == 0 else (-64, 63)
        layers.append((w, std, qp, lo, hi))
        qps.append(qp)
        bounds.append((lo, hi))
    w_rows, _s_rows, _q_rows, offsets = pack_layers(layers)
    r = w_rows.shape[0]
    assert r % 512 == 0
    noise = rng.randn(s, r, 512).astype(np.float32)
    outs = draw_all_layers(layers, seed=0, samples=s,
                           noise=jnp.asarray(noise), interpret=True)
    flat_noise = noise.reshape(s, -1)
    for (w, std, qp, lo, hi), off, out in zip(layers, offsets, outs):
        # the per-layer kernel on the same noise: BIT-identical (both
        # compute reciprocals in f32 in-kernel; the f64-reciprocal
        # oracle tolerance is covered by the per-layer oracle test)
        m, n = w.shape
        start = off * 512
        n_l = flat_noise[:, start:start + m * n].reshape(s, m, n)
        expect = np.asarray(sample_weights_int8(
            w, std, qp, seed=0, samples=s, w_lo=lo, w_hi=hi,
            noise=jnp.asarray(n_l), interpret=True))
        np.testing.assert_array_equal(np.asarray(out), expect,
                                      err_msg=str((m, n)))


def test_local_reparam_fused_matches_xla_oracle():
    b, k, n = 16, 64, 128
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, k).astype(np.float32))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.1)
    sp = jnp.asarray(rng.uniform(0.05, 0.2, (k, n)).astype(np.float32))
    noise = jnp.asarray(rng.randn(b, n).astype(np.float32))
    out = np.asarray(local_reparam_dense_fused(x, w, sp, seed=0,
                                               noise=noise, interpret=True))
    mean = np.asarray(x) @ np.asarray(w)
    var = (np.asarray(x) ** 2) @ (np.asarray(sp) ** 2)
    expect = mean + np.sqrt(1e-8 + var) * np.asarray(noise)
    np.testing.assert_allclose(out, expect, rtol=2e-5, atol=2e-5)


def test_local_reparam_fused_pads_ragged_batch():
    b, k, n = 10, 16, 128  # b not a multiple of the block
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, k).astype(np.float32))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32))
    sp = jnp.asarray(np.full((k, n), 1e-6, np.float32))
    noise = jnp.asarray(rng.randn(b, n).astype(np.float32))
    out = np.asarray(local_reparam_dense_fused(x, w, sp, seed=0, block_b=8,
                                               noise=noise, interpret=True))
    assert out.shape == (b, n)
    # with ~zero posterior std the output is the plain matmul
    np.testing.assert_allclose(out, np.asarray(x) @ np.asarray(w),
                               atol=1e-2)


def test_fused_dense_custom_vjp_matches_xla_grads():
    """The custom VJP behind local_reparam_dense_auto must match jax.grad
    of the XLA reference with identical noise."""
    from qbn_tpu.ops.stochastic import (
        _lrd_fused_bwd, local_reparam_dense, VAR_EPS,
    )
    b, k, n = 8, 32, 16
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(b, k).astype(np.float32))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.1)
    sp = jnp.asarray(rng.uniform(0.05, 0.2, (k, n)).astype(np.float32))
    noise = jnp.asarray(rng.randn(b, n).astype(np.float32))
    g = jnp.asarray(rng.randn(b, n).astype(np.float32))

    def ref(x, w, sp, noise):
        mean = x @ w
        var = jnp.square(x) @ jnp.square(sp)
        return mean + jnp.sqrt(VAR_EPS + var) * noise

    _, ref_vjp = jax.vjp(ref, x, w, sp, noise)
    want = ref_vjp(g)
    got = _lrd_fused_bwd((x, w, sp, noise), g)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_local_reparam_dense_auto_interpret_matches_plain():
    """Flag-on (interpret kernel) == flag-off, bit-compatible noise."""
    from qbn_tpu.ops.stochastic import (
        local_reparam_dense, local_reparam_dense_auto,
    )
    b, k, n = 8, 32, 16
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(b, k).astype(np.float32))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.1)
    sp = jnp.asarray(rng.uniform(0.05, 0.2, (k, n)).astype(np.float32))
    bias = jnp.asarray(rng.randn(n).astype(np.float32))
    key = jax.random.PRNGKey(11)
    plain = local_reparam_dense(x, w, sp, key, bias)
    fused = local_reparam_dense_auto(x, w, sp, key, bias, fused=True,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)
