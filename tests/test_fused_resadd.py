"""Fused residual add (conv-epilogue) vs standalone add: bitwise.

The deferred-requant handoff (ConvBlock -> DeferredMergedConv ->
ResidualAdd -> int_conv_merged residual args) computes the identical
arithmetic — requant to the conv grid, dequant both operands, add,
requant to the add grid, quantised ReLU — inside the conv's epilogue,
so codes must be BITWISE equal to the unfused kernels, at the op level
and end-to-end on the converted BBB ResNet (QBN_FUSED_RESADD on/off).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.ops.integer import int_conv_merged

B, C = 2, 24
AB = (0, 127)


def _mk(key, s):
    x = jax.random.randint(key, (B, 8, 8, s * C), -100, 100, jnp.int8)
    w = jax.random.randint(jax.random.fold_in(key, 1),
                           (s, 3, 3, C, C), -127, 127, jnp.int8)
    res = jax.random.randint(jax.random.fold_in(key, 2),
                             (B, 8, 8, s * C), -100, 100, jnp.int8)
    bias = jax.random.normal(jax.random.fold_in(key, 3), (C,)) * 0.1
    return x, w, res, bias


@pytest.mark.parametrize("s", [3, 1])
def test_op_level_bitwise(s):
    """s=3 takes the grouped 5-D epilogue; s=1 (fgc=1, the
    sample-sharded eval's chunk=1 case) the native 4-D one."""
    x, w, res, bias = _mk(jax.random.PRNGKey(0), s)
    args = dict(x_scale=0.02, w_scale=0.005, w_zp=-5, bias=bias,
                out_scale=0.03, out_zp=17, strides=(1, 1),
                padding=[(1, 1)] * 2, a_lo=AB[0], a_hi=AB[1], relu=False)
    add_s, add_zp, res_s = 0.04, 9, 0.025
    # unfused: conv -> dequant both -> add -> requant -> quantised relu
    u1 = int_conv_merged(x, w_codes=w, **args)
    total = (u1.astype(jnp.float32) * args["out_scale"]
             + res.astype(jnp.float32) * res_s)
    q = jnp.clip(jnp.round(total / add_s) + add_zp, *AB)
    want = jnp.maximum((q - add_zp).astype(jnp.int8), jnp.int8(0))
    got = int_conv_merged(x, w_codes=w, **args, residual=res,
                          res_scale=res_s, res_out_scale=add_s,
                          res_out_zp=add_zp, res_relu=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_resnet_fused_resadd_end_to_end_bitwise(monkeypatch):
    """Converted BBB ResNet merged MC eval: QBN_FUSED_RESADD on == off."""
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
    monkeypatch.setenv("QBN_FUSED_RESADD", "off")
    out_ref = mc_predict(model, variables, x, k, samples=3, mode="int",
                         plan=plan, merged=True)
    monkeypatch.setenv("QBN_FUSED_RESADD", "on")
    out_fused = mc_predict(model, variables, x, k, samples=3, mode="int",
                           plan=plan, merged=True)
    np.testing.assert_array_equal(np.asarray(out_ref),
                                  np.asarray(out_fused))
