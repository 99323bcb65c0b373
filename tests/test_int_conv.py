"""Exactness of the single-pass int8 conv/dense kernels and the
space-to-depth packed conv.

Oracle: the zero-point decomposition computed the straightforward way —
an int32 conv of u against (w - zw) with zero padding (zero padding in
u-codes IS the reference's pad-with-activation-zero-point semantics,
conv_q.py:120-125) — followed by the same requant formula. The optimized
kernels must match bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from qbn_tpu.ops.integer import int_conv, int_dense, _requant_out
from qbn_tpu.ops.s2d import int_conv_s2d, pack_weights_s2d

_DN = ("NHWC", "HWIO", "NHWC")


import pytest

pytestmark = pytest.mark.smoke

def _oracle_conv(u, w, w_zp, x_scale, w_scale, bias, out_scale, out_zp,
                 strides, padding, a_lo, a_hi, relu):
    acc = lax.conv_general_dilated(
        u.astype(jnp.int32), (w.astype(jnp.int32) - w_zp), strides, padding,
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    acc_f = acc.astype(jnp.float32) * (x_scale * w_scale)
    return _requant_out(acc_f, bias, out_scale, out_zp, relu, a_lo, a_hi)


def _rand_case(rng, b=2, h=8, w=8, cin=5, cout=7, kh=3, kw=3):
    u = rng.randint(-100, 101, (b, h, w, cin)).astype(np.int8)
    wc = rng.randint(-128, 128, (kh, kw, cin, cout)).astype(np.int8)
    bias = rng.randn(cout).astype(np.float32) * 0.1
    return jnp.asarray(u), jnp.asarray(wc), jnp.asarray(bias)


def test_int_conv_matches_oracle():
    rng = np.random.RandomState(0)
    for w_zp in (0, -7, 11):
        for strides, pad in (((1, 1), 1), ((2, 2), 1), ((1, 1), 0)):
            u, wc, bias = _rand_case(rng)
            got = int_conv(u, 0.02, 3, wc, 0.005, w_zp, bias, 0.03, 17,
                           strides, [(pad, pad)] * 2, 0, 127, relu=True)
            want = _oracle_conv(u, wc, w_zp, 0.02, 0.005, bias, 0.03, 17,
                                strides, [(pad, pad)] * 2, 0, 127, True)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int_conv_cout_multiple_of_128_branch():
    rng = np.random.RandomState(1)
    u, wc, bias = _rand_case(rng, cin=3, cout=128)
    got = int_conv(u, 0.02, 3, wc, 0.005, -5, bias, 0.03, 17,
                   (1, 1), [(1, 1)] * 2, 0, 127, relu=False)
    want = _oracle_conv(u, wc, -5, 0.02, 0.005, bias, 0.03, 17,
                        (1, 1), [(1, 1)] * 2, 0, 127, False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_s2d_conv_matches_int_conv():
    rng = np.random.RandomState(2)
    for cin, cout in ((5, 7), (24, 24), (3, 24)):
        u, wc, bias = _rand_case(rng, b=2, h=8, w=8, cin=cin, cout=cout)
        direct = int_conv(u, 0.02, 3, wc, 0.005, -9, bias, 0.03, 17,
                          (1, 1), [(1, 1)] * 2, 0, 127, relu=True)
        packed = int_conv_s2d(u, 0.02, pack_weights_s2d(wc), cout,
                              0.005, -9, bias, 0.03, 17, 0, 127, relu=True)
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(packed))


def test_int_dense_matches_oracle():
    rng = np.random.RandomState(3)
    u = jnp.asarray(rng.randint(-100, 101, (4, 13)).astype(np.int8))
    wc = jnp.asarray(rng.randint(-128, 128, (13, 9)).astype(np.int8))
    bias = jnp.asarray(rng.randn(9).astype(np.float32) * 0.1)
    got = int_dense(u, 0.02, 3, wc, 0.005, -4, bias, 0.03, 17, 0, 127)
    acc = u.astype(jnp.int32) @ (wc.astype(jnp.int32) + 4)
    want = _requant_out(acc.astype(jnp.float32) * (0.02 * 0.005), bias,
                        0.03, 17, False, 0, 127)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vmapped_int_conv_matches_per_sample():
    """The custom_vmap merged-sample rule must be bit-identical to mapping
    the unbatched kernel over samples."""
    rng = np.random.RandomState(7)
    u, _, bias = _rand_case(rng, b=2, h=8, w=8, cin=5, cout=7)
    ws = jnp.asarray(
        rng.randint(-128, 128, (6, 3, 3, 5, 7)).astype(np.int8))

    def one(w1):
        return int_conv(u, 0.02, 3, w1, 0.005, -9, bias, 0.03, 17,
                        (1, 1), [(1, 1)] * 2, 0, 127, relu=True)

    batched = jax.vmap(one)(ws)
    looped = jnp.stack([one(ws[i]) for i in range(6)])
    np.testing.assert_array_equal(np.asarray(batched), np.asarray(looped))


def test_both_batched_int_conv_matches_per_sample():
    """Per-sample activations AND weights (deep MC layers): the
    batch-grouped-conv rule must be bit-identical to the per-sample loop."""
    rng = np.random.RandomState(9)
    us = jnp.asarray(
        rng.randint(-100, 101, (6, 2, 8, 8, 5)).astype(np.int8))
    ws = jnp.asarray(
        rng.randint(-128, 128, (6, 3, 3, 5, 7)).astype(np.int8))
    bias = jnp.asarray(rng.randn(7).astype(np.float32) * 0.1)

    for strides, pad in (((1, 1), 1), ((2, 2), 1)):
        def one(u1, w1):
            return int_conv(u1, 0.02, 3, w1, 0.005, -9, bias, 0.03, 17,
                            strides, [(pad, pad)] * 2, 0, 127, relu=True)

        batched = jax.vmap(one)(us, ws)
        looped = jnp.stack([one(us[i], ws[i]) for i in range(6)])
        np.testing.assert_array_equal(np.asarray(batched),
                                      np.asarray(looped))


def test_vmapped_int_dense_matches_per_sample():
    rng = np.random.RandomState(8)
    u = jnp.asarray(rng.randint(-100, 101, (4, 13)).astype(np.int8))
    ws = jnp.asarray(rng.randint(-128, 128, (6, 13, 9)).astype(np.int8))
    bias = jnp.asarray(rng.randn(9).astype(np.float32) * 0.1)

    def one(w1):
        return int_dense(u, 0.02, 3, w1, 0.005, -4, bias, 0.03, 17,
                         0, 127, relu=True)

    batched = jax.vmap(one)(ws)
    looped = jnp.stack([one(ws[i]) for i in range(6)])
    np.testing.assert_array_equal(np.asarray(batched), np.asarray(looped))


def test_codes_fit_int8_for_sub8_activations():
    """u = q - zp fits int8 for any activation precision <= 7 bits."""
    for a_hi in (127, 63, 3):
        q = np.arange(0, a_hi + 1)
        for zp in range(0, a_hi + 1):
            u = q - zp
            assert u.min() >= -128 and u.max() <= 127


def test_mc_group_conv_kernel_matches_per_sample():
    """The Pallas fused MC conv (interpret mode) must be bit-identical to
    the per-sample int_conv at 3x3/stride-1/pad-1."""
    from qbn_tpu.ops.pallas.conv_gemm import mc_group_conv
    rng = np.random.RandomState(11)
    for s, b, h, cin, cout in ((3, 2, 8, 5, 7), (2, 3, 16, 24, 24)):
        us = jnp.asarray(
            rng.randint(-100, 101, (s, b, h, h, cin)).astype(np.int8))
        ws = jnp.asarray(
            rng.randint(-128, 128, (s, 3, 3, cin, cout)).astype(np.int8))
        bias = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
        got = mc_group_conv(us, 0.02, ws, 0.005, -9, bias, 0.03, 17,
                            0, 127, relu=True, interpret=True)
        want = jnp.stack([
            int_conv(us[i], 0.02, 3, ws[i], 0.005, -9, bias, 0.03, 17,
                     (1, 1), [(1, 1)] * 2, 0, 127, relu=True)
            for i in range(s)])
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_im2col_shallow_cin_bitwise(monkeypatch):
    """The shallow-cin im2col formulation (patches + 1x1 conv; flag-gated
    QBN_IM2COL=on — measured SLOWER than XLA's own conv on v5e, kept as
    the measurement library) must be bitwise-identical to the plain
    conv — incl. strides and asymmetric padding — for both the single
    int_conv and the merged shared-x stem path."""
    from qbn_tpu.ops import integer as I
    from qbn_tpu.ops.integer import int_conv_merged

    rng = np.random.RandomState(7)
    cases = [
        ((1, 1), [(1, 1), (1, 1)], 3),     # the CIFAR stem shape family
        ((2, 2), [(1, 2), (0, 1)], 4),     # stride + asymmetric padding
        ((1, 1), [(2, 2), (2, 2)], 1),     # LeNet 5x5 cin=1 (below, kh=5)
    ]
    for (strides, pad, cin), kh in zip(cases, (3, 3, 5)):
        u, wc, bias = _rand_case(rng, cin=cin, cout=24, kh=kh, kw=kh)
        args = (0.02, 3, wc, 0.005, -9, bias, 0.03, 17, strides, pad,
                0, 127, True)
        monkeypatch.setenv("QBN_IM2COL", "on")
        assert I._use_im2col(kh, kh, cin)
        got = int_conv(u, *args)
        monkeypatch.delenv("QBN_IM2COL")
        assert not I._use_im2col(kh, kh, cin)
        want = int_conv(u, *args)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # merged shared-x stem: (B,H,W,cin) x (S,kh,kw,cin,cout)
    s = 3
    u = jnp.asarray(rng.randint(-100, 101, (2, 8, 8, 3)).astype(np.int8))
    ws = jnp.asarray(rng.randint(-128, 128, (s, 3, 3, 3, 24)).astype(np.int8))
    bias = jnp.asarray(rng.randn(24).astype(np.float32) * 0.1)
    margs = dict(x_scale=0.02, w_scale=0.005, w_zp=-9, bias=bias,
                 out_scale=0.03, out_zp=17, strides=(1, 1),
                 padding=((1, 1), (1, 1)), a_lo=0, a_hi=127, relu=True,
                 shared_x=True)
    monkeypatch.setenv("QBN_IM2COL", "on")
    got = int_conv_merged(u, w_codes=ws, **margs)
    monkeypatch.delenv("QBN_IM2COL")
    want = int_conv_merged(u, w_codes=ws, **margs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_x_batched_shared_weight_conv_matches_per_sample():
    """Per-sample activations with SHARED weights (the MC-Dropout case):
    the folded-batch rule (one plain full-width conv, native-view
    requant) must be bit-identical to the per-sample loop. Covers both
    the centered-bf16 shallow branch and the winsum deep branch."""
    rng = np.random.RandomState(11)
    for cin in (5, 60):  # 3*3*60 = 540 > _BF16_CENTERED_K: deep branch
        us = jnp.asarray(
            rng.randint(-100, 101, (6, 2, 8, 8, cin)).astype(np.int8))
        wc = jnp.asarray(
            rng.randint(-128, 128, (3, 3, cin, 7)).astype(np.int8))
        bias = jnp.asarray(rng.randn(7).astype(np.float32) * 0.1)

        for strides, pad in (((1, 1), 1), ((2, 2), 1)):
            def one(u1):
                return int_conv(u1, 0.02, 3, wc, 0.005, -9, bias, 0.03,
                                17, strides, [(pad, pad)] * 2, 0, 127,
                                relu=True)

            batched = jax.vmap(one)(us)
            looped = jnp.stack([one(us[i]) for i in range(6)])
            np.testing.assert_array_equal(np.asarray(batched),
                                          np.asarray(looped))
