"""Integer inference kernels: int8 MXU dense / conv with exact zero-point
decomposition.

TPU-native replacement for the FBGEMM int8 CPU kernels behind the
reference's converted models (reference: src/models/stochastic/bbb/
quantized/linear_q.py:93, conv_q.py:120-125).

Representation: activations travel as CENTERED int8 codes c = q - 128,
where q is the uint8-convention code with zero point zp (so
dequant(c) = (c + 128 - zp) * scale). Centering keeps every tensor int8 —
4x less HBM traffic than an int32 carrier and both MXU operands natively
int8. Weights are int8 codes with zero point zw.

With u = q - zp = c - zt (zt = zp - 128) and w' = w - zw, the int32
accumulator decomposes exactly into one big int8 x int8 MXU product plus
cheap rank-1 / constant corrections:

  dense:  u . w' = dot(c, w) - zw*rowsum(c) - zt*colsum(w) + K*zt*zw
  conv:   u * w' = conv(c, w) - zw*conv(c, 1) - zt*conv(mask, w)
                   + zt*zw*conv(mask, 1)
          (mask = 1 on the image, 0 on the zero padding: FBGEMM pads with
          the activation zero point, i.e. u = 0 in the halo.)

Requantisation: c_out = clamp(round((acc*sx*sw + bias)/sy) + zy, 0,255)-128,
then the sub-8-bit clamp (reference clamp_activation, src/utils.py:25-31).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _requant_out(acc_f32, bias, out_scale, out_zp, relu, a_lo, a_hi):
    """Float-requantise an accumulator to centered int8 codes."""
    y = acc_f32
    if bias is not None:
        y = y + bias
    q = jnp.round(y / out_scale) + out_zp
    q = jnp.clip(q, 0, 255) - 128
    if relu:
        q = jnp.maximum(q, out_zp - 128)  # quantised ReLU: max(code, zp)
    return jnp.clip(q, a_lo - 128, a_hi - 128).astype(jnp.int8)


def int_dense(x_codes, x_scale, x_zp, w_codes, w_scale, w_zp, bias,
              out_scale, out_zp, a_lo: int, a_hi: int, relu: bool = False):
    """Quantised dense layer on centered int8 activation codes.

    Args:
      x_codes: (B, K) centered int8 codes.
      w_codes: (K, N) int8 weight codes (int8 or int32 carrying int8 range).
    Returns (B, N) centered int8 codes on (out_scale, out_zp).
    """
    k = x_codes.shape[-1]
    zt = x_zp - 128
    w8 = w_codes.astype(jnp.int8)
    acc = lax.dot_general(x_codes, w8, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    rowsum_c = jnp.sum(x_codes.astype(jnp.int32), axis=-1, keepdims=True)
    colsum_w = jnp.sum(w_codes.astype(jnp.int32), axis=0, keepdims=True)
    acc = acc - w_zp * rowsum_c - zt * colsum_w + k * zt * w_zp
    acc_f = acc.astype(jnp.float32) * (x_scale * w_scale)
    return _requant_out(acc_f, bias, out_scale, out_zp, relu, a_lo, a_hi)


def int_conv(x_codes, x_scale, x_zp, w_codes, w_scale, w_zp, bias,
             out_scale, out_zp, strides, padding,
             a_lo: int, a_hi: int, relu: bool = False):
    """Quantised 2-D conv on centered int8 codes (NHWC / HWIO), computed as
    one int8 MXU conv + three cheap correction convs."""
    zt = x_zp - 128
    w8 = w_codes.astype(jnp.int8)
    kh, kw, cin, cout = w8.shape

    # A: the heavy int8 x int8 product
    acc = lax.conv_general_dilated(
        x_codes, w8, strides, padding, dimension_numbers=_DN,
        preferred_element_type=jnp.int32)

    # B: -zw * window-sum of activations (per batch/position, bcast cout)
    ones_k = jnp.ones((kh, kw, cin, 1), jnp.int8)
    winsum = lax.conv_general_dilated(
        x_codes, ones_k, strides, padding, dimension_numbers=_DN,
        preferred_element_type=jnp.int32)

    # C/D: padding-aware constants (batch-independent): conv of the valid
    # mask with the cin-summed weights / with the window size. f32 is exact
    # here (values << 2^24).
    h, w_sp = x_codes.shape[1], x_codes.shape[2]
    mask = jnp.ones((1, h, w_sp, 1), jnp.float32)
    wsum = jnp.sum(w_codes.astype(jnp.float32), axis=2, keepdims=True)
    maskw = lax.conv_general_dilated(mask, wsum, strides, padding,
                                     dimension_numbers=_DN)
    maskn = lax.conv_general_dilated(
        mask, jnp.ones((kh, kw, 1, 1), jnp.float32), strides, padding,
        dimension_numbers=_DN) * cin

    acc_f = (acc - w_zp * winsum).astype(jnp.float32) \
        - zt * maskw + (zt * w_zp) * maskn
    acc_f = acc_f * (x_scale * w_scale)
    return _requant_out(acc_f, bias, out_scale, out_zp, relu, a_lo, a_hi)
