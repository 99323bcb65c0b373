"""Stage-resident space-to-depth merged INT path: bitwise equivalence.

The packed formulation (qbn_tpu.ops.s2d_merged) computes the same
products with f32-exact accumulation and the same requant arithmetic, so
codes must be BITWISE equal to int_conv_merged on unpacked tensors —
at the op level (conv chains incl. the psi border mask) and end-to-end
(converted BBB ResNet, QBN_S2D_MERGED on vs off).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.ops.integer import int_conv_merged
from qbn_tpu.ops.s2d_merged import (
    int_conv_s2d_merged, int_conv_s2d_stem, pack_phi, unpack_phi,
)

S, B, C = 3, 2, 24
ARGS = dict(w_scale=0.005, w_zp=-5, out_scale=0.03, out_zp=17)
AB = (0, 127)


def _ref_conv(x, w, relu, bias=None, x_scale=0.02):
    return int_conv_merged(x, x_scale, w, ARGS["w_scale"], ARGS["w_zp"],
                           bias, ARGS["out_scale"], ARGS["out_zp"],
                           (1, 1), [(1, 1)] * 2, *AB, relu=relu)


def _pk_conv(xp, w, relu, to_psi, bias=None, x_scale=0.02):
    return int_conv_s2d_merged(xp, x_scale, w, ARGS["w_scale"],
                               ARGS["w_zp"], bias, ARGS["out_scale"],
                               ARGS["out_zp"], *AB, relu=relu,
                               to_psi=to_psi)


def test_pack_unpack_roundtrip():
    x = jax.random.randint(jax.random.PRNGKey(0), (B, 8, 8, S * C),
                           -100, 100, jnp.int8)
    rt = unpack_phi(pack_phi(x, S), S)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(rt))


def test_two_conv_chain_bitwise():
    """phi->psi->phi chain (one residual-block body) == two
    int_conv_merged layers on the unpacked tensors; covers the psi
    border mask (the second conv reads the masked border as the
    original zero padding)."""
    key = jax.random.PRNGKey(1)
    x = jax.random.randint(key, (B, 8, 8, S * C), -100, 100, jnp.int8)
    w1 = jax.random.randint(jax.random.fold_in(key, 1),
                            (S, 3, 3, C, C), -127, 127, jnp.int8)
    w2 = jax.random.randint(jax.random.fold_in(key, 2),
                            (S, 3, 3, C, C), -127, 127, jnp.int8)
    bias = jax.random.normal(jax.random.fold_in(key, 3), (C,)) * 0.1

    y1 = _ref_conv(x, w1, relu=True, bias=bias)
    y2 = _ref_conv(y1, w2, relu=False, x_scale=float(ARGS["out_scale"]))

    xp = pack_phi(x, S)
    z1 = _pk_conv(xp, w1, relu=True, to_psi=True, bias=bias)
    assert z1.shape == (B, 5, 5, S * 4 * C)          # psi: 8/2 + 1
    z2 = _pk_conv(z1, w2, relu=False, to_psi=False,
                  x_scale=float(ARGS["out_scale"]))
    np.testing.assert_array_equal(np.asarray(y2),
                                  np.asarray(unpack_phi(z2, S)))
    # intermediate too: psi positions that are in-image match y1
    y1p = np.asarray(pack_phi(y1, S)).reshape(B, 4, 4, S, 4, C)
    z1v = np.asarray(z1).reshape(B, 5, 5, S, 4, C)
    # psi block (a, b) slot (1, 1) == phi block (a, b) slot (0, 0)? No —
    # check via unpack algebra instead: psi rows 2a-1+p for in-image
    # positions equal y1 rows directly.
    z1u = np.zeros((B, 10, 10, S, C), np.int8)
    for a in range(5):
        for p in range(2):
            for b_ in range(5):
                for q in range(2):
                    z1u[:, 2 * a + p, 2 * b_ + q] = \
                        z1v[:, a, b_, :, p * 2 + q, :]
    got = z1u[:, 1:9, 1:9]                           # rows -1..8 -> 0..7
    want = np.asarray(y1).reshape(B, 8, 8, S, C)
    np.testing.assert_array_equal(want, got)
    # border rows (-1 and 8) are exactly zero
    assert (z1u[:, 0] == 0).all() and (z1u[:, 9] == 0).all()
    assert (z1u[:, :, 0] == 0).all() and (z1u[:, :, 9] == 0).all()


def test_stem_packed_output_bitwise():
    """4x4/stride-2 packed-output stem == int_conv_merged(shared_x) then
    pack_phi."""
    key = jax.random.PRNGKey(4)
    x = jax.random.randint(key, (B, 8, 8, 3), -100, 100, jnp.int8)
    w = jax.random.randint(jax.random.fold_in(key, 1),
                           (S, 3, 3, 3, C), -127, 127, jnp.int8)
    ref = int_conv_merged(x, 0.02, w, ARGS["w_scale"], ARGS["w_zp"],
                          None, ARGS["out_scale"], ARGS["out_zp"],
                          (1, 1), [(1, 1)] * 2, *AB, relu=True,
                          shared_x=True)
    got = int_conv_s2d_stem(x, 0.02, w, ARGS["w_scale"], ARGS["w_zp"],
                            None, ARGS["out_scale"], ARGS["out_zp"],
                            *AB, relu=True)
    np.testing.assert_array_equal(np.asarray(pack_phi(ref, S)),
                                  np.asarray(got))


def test_resnet_s2d_end_to_end_bitwise(monkeypatch):
    """Converted BBB ResNet merged MC eval: QBN_S2D_MERGED on == off."""
    from qbn_tpu.config import Config
    from qbn_tpu.evaluation.mc import mc_predict, presample_plan
    from qbn_tpu.models.factory import build_model
    from qbn_tpu.utils import init_variables, apply_model, convert_model

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    cfg = Config(model="conv_resnet_bbb", sigma_prior=0.1, at=True,
                 q=True, output_size=10)
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    variables = init_variables(model, key, x, quantized=True)
    _, _, variables = apply_model(model, variables, x, key, train=True,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, key)
    plan = presample_plan(variables)
    k = jax.random.PRNGKey(7)
    monkeypatch.setenv("QBN_S2D_MERGED", "off")
    out_ref = mc_predict(model, variables, x, k, samples=3, mode="int",
                         plan=plan, merged=True)
    monkeypatch.setenv("QBN_S2D_MERGED", "on")
    out_s2d = mc_predict(model, variables, x, k, samples=3, mode="int",
                         plan=plan, merged=True)
    np.testing.assert_array_equal(np.asarray(out_ref),
                                  np.asarray(out_s2d))
