"""Accuracy of the fast-math Box-Muller helpers (QBN_DRAW_FAST path).

The draw kernel quantises the noise to the fixed 3/127 grid immediately
(reference contract: src/models/stochastic/bbb/quantized/__init__.py:1-2),
so the polynomial approximations only need |Δε| far below the 0.0236σ bin
width for the emitted int8 codes to be (almost always) identical to the
library-transcendental path. These tests pin the max errors on dense
grids using the same arithmetic as the kernel (bitcast injected so the
mantissa/exponent trick runs on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np

from qbn_tpu.ops.pallas.sample_weights import (
    _cheap_neg_log, _fast_ndtri, _fast_neg_log, _fast_sincos, NOISE_SCALE,
)


def _bitcast(x, dtype):
    return jax.lax.bitcast_convert_type(x, dtype)


def test_fast_sincos_dense_grid():
    u = np.concatenate([
        np.linspace(0.0, 1.0, 1 << 18, endpoint=False),
        np.random.default_rng(0).uniform(0.0, 1.0, 1 << 16),
        # quadrant boundaries and their f32 neighbours
        np.nextafter(np.array([0.25, 0.5, 0.75], np.float32), 0.0),
        np.nextafter(np.array([0.25, 0.5, 0.75], np.float32), 1.0),
        np.array([0.0, 0.25, 0.5, 0.75], np.float32),
    ]).astype(np.float32)
    c, s = jax.jit(_fast_sincos)(jnp.asarray(u))
    t = 2.0 * np.pi * u.astype(np.float64)
    err_c = np.abs(np.asarray(c, np.float64) - np.cos(t)).max()
    err_s = np.abs(np.asarray(s, np.float64) - np.sin(t)).max()
    assert err_c < 5e-6, err_c
    assert err_s < 5e-6, err_s


def test_fast_neg_log_dense_grid():
    k = np.arange(1 << 18, dtype=np.int64) * ((1 << 23) // (1 << 18))
    u = (1.0 - k * 2.0 ** -23).astype(np.float32)  # the exact u1 lattice
    u = np.concatenate([
        u, np.float32([1.0, 2.0 ** -23, np.nextafter(1.0, 0.0,
                                                     dtype=np.float32)]),
        np.random.default_rng(1).uniform(2.0 ** -23, 1.0,
                                         1 << 16).astype(np.float32)])
    got = jax.jit(lambda x: _fast_neg_log(x, _bitcast))(jnp.asarray(u))
    want = -np.log(u.astype(np.float64))
    err = np.abs(np.asarray(got, np.float64) - want)
    # absolute error bound where it matters (r = sqrt(2*neglog) <= 3σ
    # before the ±3σ clamp, i.e. neglog <= 4.5)
    assert err[want <= 8.0].max() < 2e-6, err[want <= 8.0].max()
    # relative error everywhere (tail values only feed the clamp)
    rel = err / np.maximum(want, 1e-12)
    assert rel[want > 1e-3].max() < 2e-5, rel[want > 1e-3].max()


def test_cheap_neg_log_dense_grid():
    """The ICDF path's log: ~1e-3 absolute is plenty (dx/dw ≤ 0.7 through
    the quantile polynomial, noise bin width 2.36e-2)."""
    u = np.concatenate([
        np.linspace(2.0 ** -23, 1.0, 1 << 18).astype(np.float32),
        np.float32([1.0, 2.0 ** -23, 2.0 ** -21,
                    np.nextafter(1.0, 0.0, dtype=np.float32)]),
        np.random.default_rng(3).uniform(0.0, 1.0,
                                         1 << 16).astype(np.float32)])
    u = u[u > 0]
    got = jax.jit(lambda x: _cheap_neg_log(x, _bitcast))(jnp.asarray(u))
    want = -np.log(u.astype(np.float64))
    err = np.abs(np.asarray(got, np.float64) - want)
    assert err.max() < 1.5e-3, err.max()


def test_fast_ndtri_dense_grid():
    """Quantile accuracy on the kernel's exact uniform lattice: core
    |Δx| far below the 3/127 bin; tail (|x| > 3.05, incl. u = 1 exactly)
    stays above the ±128-code clamp threshold."""
    from scipy.special import ndtri
    k = np.arange(1 << 19, dtype=np.int64) * ((1 << 23) // (1 << 19))
    u = (1.0 - k * 2.0 ** -23).astype(np.float32)  # u = 2 - f1 lattice
    u = np.concatenate([
        u, np.random.default_rng(4).uniform(2.0 ** -23, 1.0,
                                            1 << 16).astype(np.float32)])
    got = np.asarray(jax.jit(lambda x: _fast_ndtri(x, _bitcast))(
        jnp.asarray(u)), np.float64)
    # exact reference; the u = 1 lattice point has no finite quantile —
    # the kernel clamps w at 16, so require the clamp-tail contract there
    want = ndtri(np.minimum(u.astype(np.float64), 1.0 - 2.0 ** -53))
    core = np.abs(want) <= 3.05
    derr = np.abs(got - want)[core].max()
    assert derr < 1e-3, derr                  # bin width is 2.36e-2
    assert (np.abs(got)[~core] >= 3.05).all()
    # emitted quantised codes match the exact quantile's codes except
    # within float-noise of a bin edge
    code_f = np.clip(np.round(got / NOISE_SCALE), -128, 127)
    code_e = np.clip(np.round(want / NOISE_SCALE), -128, 127)
    frac = (code_f != code_e).mean()
    assert frac < 6e-3, frac
    assert np.abs(code_f - code_e).max() <= 1
    # sanity on the quantised-draw distribution over the exact lattice
    d = code_f * NOISE_SCALE
    assert abs(d.mean()) < 5e-3, d.mean()
    assert abs(d.std() - 1.0) < 5e-3, d.std()


def test_fast_pair_vs_library_codes():
    """End-to-end ε comparison on the kernel's exact uniform lattice:
    the fast path's ε must sit within a small fraction of the 3/127
    quantisation bin of the library-transcendental value."""
    rng = np.random.default_rng(2)
    f1 = (1.0 + rng.integers(0, 1 << 23, 1 << 17) * 2.0 ** -23
          ).astype(np.float32)
    f2 = (1.0 + rng.integers(0, 1 << 23, 1 << 17) * 2.0 ** -23
          ).astype(np.float32)
    u1 = (2.0 - f1).astype(np.float32)
    u2 = (f2 - 1.0).astype(np.float32)

    def fast(u1, u2):
        r = jnp.sqrt(2.0 * _fast_neg_log(u1, _bitcast))
        c, s = _fast_sincos(u2)
        return r * c, r * s

    a_f, b_f = jax.jit(fast)(jnp.asarray(u1), jnp.asarray(u2))
    r = np.sqrt(-2.0 * np.log(u1.astype(np.float64)))
    t = 2.0 * np.pi * u2.astype(np.float64)
    a_l, b_l = r * np.cos(t), r * np.sin(t)
    # absolute ε error after the ±3σ clamp region (codes clamp at ±127)
    for fast_v, lib_v in ((a_f, a_l), (b_f, b_l)):
        fv = np.asarray(fast_v, np.float64)
        inside = np.abs(lib_v) <= 3.2
        derr = np.abs(fv - lib_v)[inside].max()
        assert derr < 5e-5, derr          # bin width is 2.36e-2
        # identical quantised codes except within float-noise of an edge
        code_f = np.clip(np.round(fv / NOISE_SCALE), -128, 127)
        code_l = np.clip(np.round(lib_v / NOISE_SCALE), -128, 127)
        frac = (code_f != code_l).mean()
        assert frac < 5e-3, frac
