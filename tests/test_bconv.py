"""Oracle tests for the persistent-layout Pallas MC conv (ops/pallas/bconv).

Bit-exactness vs qbn_tpu.ops.integer.int_conv (itself tested against the
int32 reference semantics in tests/test_int_conv.py), in interpret mode on
CPU. Covers both storage phases, relu on/off, bias, and sub-8-bit clamps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbn_tpu.ops.integer import int_conv
from qbn_tpu.ops.pallas.bconv import (
    bconv, extent, pack_codes, unpack_codes,
)


@pytest.mark.parametrize("phase", [0, 1])
@pytest.mark.parametrize("h", [8, 4])
def test_pack_unpack_roundtrip(phase, h):
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (3, h, h, 5), -127, 128, jnp.int8)
    p = pack_codes(x, phase)
    e = extent(h)
    assert p.shape == (e, e, 3, 20)
    np.testing.assert_array_equal(unpack_codes(p, phase), x)
    # boundary blocks are exact zeros
    np.testing.assert_array_equal(np.asarray(p[e - 1]), 0)
    np.testing.assert_array_equal(np.asarray(p[:, e - 1]), 0)
    if phase == 0:
        np.testing.assert_array_equal(np.asarray(p[0]), 0)
        np.testing.assert_array_equal(np.asarray(p[:, 0]), 0)


@pytest.mark.parametrize("phase", [0, 1])
@pytest.mark.parametrize("relu,a_lo,a_hi", [(False, 0, 127), (True, 0, 63)])
def test_bconv_matches_int_conv(phase, relu, a_lo, a_hi):
    key = jax.random.PRNGKey(1)
    s, b, h, cin, cout = 3, 8, 8, 6, 5
    ks = jax.random.split(key, 4)
    # activation codes must be zero-point-removed 7-bit-ish
    x = jax.random.randint(ks[0], (s, b, h, h, cin), -100, 101, jnp.int8)
    w = jax.random.randint(ks[1], (s, 3, 3, cin, cout), -127, 128, jnp.int8)
    bias = jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1
    x_scale, w_scale, w_zp = 0.02, 0.005, -3
    out_scale, out_zp = 0.03, 17

    ref = jax.vmap(lambda xi, wi: int_conv(
        xi, x_scale, 0, wi, w_scale, w_zp, bias, out_scale, out_zp,
        (1, 1), [(1, 1)] * 2, a_lo, a_hi, relu=relu))(x, w)

    xp = jax.vmap(lambda xi: pack_codes(xi, phase))(x)
    out_p = bconv(xp, x_scale, w, w_scale, w_zp, bias, out_scale, out_zp,
                  a_lo, a_hi, phase=phase, relu=relu, interpret=True)
    out = jax.vmap(lambda oi: unpack_codes(oi, 1 - phase))(out_p)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # output boundary blocks stay exact zeros (layout invariant)
    e = extent(h)
    np.testing.assert_array_equal(np.asarray(out_p[:, e - 1]), 0)
    if phase == 1:  # output phase 0 = aligned: zeros at both ends
        np.testing.assert_array_equal(np.asarray(out_p[:, 0]), 0)


def test_bconv_phase_chain():
    """Two chained convs (phase 0 -> 1 -> 0) equal two chained int_convs."""
    key = jax.random.PRNGKey(2)
    s, b, h, c = 2, 4, 8, 4
    ks = jax.random.split(key, 3)
    x = jax.random.randint(ks[0], (s, b, h, h, c), -100, 101, jnp.int8)
    w1 = jax.random.randint(ks[1], (s, 3, 3, c, c), -127, 128, jnp.int8)
    w2 = jax.random.randint(ks[2], (s, 3, 3, c, c), -127, 128, jnp.int8)
    args1 = (0.02, None, 0.03, 11)   # x_scale, bias, out_scale, out_zp
    args2 = (0.03, None, 0.05, 29)

    def ref_one(xi, wi, xs, bias, os_, oz):
        return int_conv(xi, xs, 0, wi, 0.004, 2, bias, os_, oz,
                        (1, 1), [(1, 1)] * 2, 0, 127, relu=True)
    r = jax.vmap(lambda xi, wi: ref_one(xi, wi, *args1))(x, w1)
    r = jax.vmap(lambda xi, wi: ref_one(xi, wi, *args2))(r, w2)

    xp = jax.vmap(lambda xi: pack_codes(xi, 0))(x)
    y = bconv(xp, args1[0], w1, 0.004, 2, args1[1], args1[2], args1[3],
              0, 127, phase=0, relu=True, interpret=True)
    y = bconv(y, args2[0], w2, 0.004, 2, args2[1], args2[2], args2[3],
              0, 127, phase=1, relu=True, interpret=True)
    out = jax.vmap(lambda oi: unpack_codes(oi, 0))(y)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(r))
