"""Integer inference kernels: quantised dense / conv with float rescale.

TPU-native replacement for the FBGEMM int8 CPU kernels the reference's
converted models call (reference: src/models/stochastic/bbb/quantized/
linear_q.py:93, conv_q.py:120-125). Activations travel as uint8-range codes
in int32 carriers; weights are int8 codes. The dense path feeds the MXU with
an int8 x int8 -> int32 dot (the activation codes are shifted by 128 to fit
int8, with a column-sum correction). The conv path accumulates exactly in
float32 (worst-case accumulator magnitudes here are < 2^26; the post-scale
requantisation step is ~2^8 coarser than any f32 rounding).

Requantisation: y_code = clamp(round((acc * sx * sw + bias) / sy) + zy),
matching FBGEMM's float-requant to within rounding.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _requant_out(acc_f32, bias, out_scale, out_zp, relu, a_lo, a_hi):
    y = acc_f32
    if bias is not None:
        y = y + bias
    q = jnp.round(y / out_scale) + out_zp
    q = jnp.clip(q, 0, 255).astype(jnp.int32)
    if relu:
        q = jnp.maximum(q, out_zp)  # quantised ReLU: max(code, zero_point)
    return jnp.clip(q, a_lo, a_hi)  # sub-8-bit clamp (utils.py:25-31 semantics)


def int_dense(x_codes, x_scale, x_zp, w_codes, w_scale, w_zp, bias,
              out_scale, out_zp, a_lo: int, a_hi: int, relu: bool = False):
    """Quantised dense layer on integer codes.

    Args:
      x_codes: (B, in) activation codes (int32, uint8 range).
      w_codes: (in, out) weight codes (int8 or int32 carrying int8 range).
    Returns (B, out) activation codes (int32) on (out_scale, out_zp).
    """
    # Exact zero-point decomposition keeping both MXU operands in int8:
    #   (x - zx).(w - zw) = (x-128).w + (128-zx)*colsum(w)
    #                       - zw*rowsum(x-zx)
    # x in [0,255] so x-128 fits int8; w codes are already int8.
    k = x_codes.shape[-1]
    x8 = (x_codes - 128).astype(jnp.int8)
    w8 = w_codes.astype(jnp.int8)
    acc = lax.dot_general(
        x8, w8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    w32 = w_codes.astype(jnp.int32)
    colsum_w = jnp.sum(w32, axis=0, keepdims=True)           # (1, out)
    rowsum_x = jnp.sum(x_codes.astype(jnp.int32), axis=-1,
                       keepdims=True) - k * x_zp             # (B, 1)
    acc = acc + (128 - x_zp) * colsum_w - w_zp * rowsum_x
    acc_f = acc.astype(jnp.float32) * (x_scale * w_scale)
    return _requant_out(acc_f, bias, out_scale, out_zp, relu, a_lo, a_hi)


def int_conv(x_codes, x_scale, x_zp, w_codes, w_scale, w_zp, bias,
             out_scale, out_zp, strides, padding,
             a_lo: int, a_hi: int, relu: bool = False):
    """Quantised 2-D convolution on integer codes (NHWC / HWIO).

    Zero-padding in the integer domain must pad with the activation
    zero-point, not 0; equivalently we center the codes first and pad with
    zeros, which is what XLA's conv does.
    """
    xc = (x_codes - x_zp).astype(jnp.float32)
    wc = (w_codes.astype(jnp.int32) - w_zp).astype(jnp.float32)
    acc = lax.conv_general_dilated(
        xc, wc, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    acc_f = acc * (x_scale * w_scale)
    return _requant_out(acc_f, bias, out_scale, out_zp, relu, a_lo, a_hi)
