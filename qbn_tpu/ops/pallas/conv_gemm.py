"""Fused MC-sample int8 conv (Pallas TPU kernel): the deep-layer hot op.

MC evaluation of the converted Bayesian nets computes, per posterior
sample s, conv(x_s, w_s) on int8 codes followed by requantisation
(reference int path: src/models/stochastic/bbb/quantized/conv_q.py:107-125
on FBGEMM). XLA's best grouped lowering (batch_group_count) runs the
ResNet-18 width-24 stages at ~24 effective TOPS because the MXU contracts
only cin<=48 channels per pass and round-trips int32 accumulators through
HBM (tools/microbench_conv.py).

This kernel reformulates the 3x3/stride-1/pad-1 conv as one implicit GEMM
per (sample, batch-block):

  * activations arrive space-to-depth packed: (S, B, H/2+1, W/2+1, 4*cin)
    int8 (one cheap XLA int8 re-layout per layer);
  * the patch matrix (BB*(H/2)*(W/2), 16*cin) is built IN VMEM from four
    static slices — the 16/9 tap redundancy buys a 4x deeper contraction
    (K = 16*cin) and 4x wider output (N = 4*cout + 4 winsum columns), both
    MXU-shaped, and the int32 accumulator never touches HBM;
  * the packed weights (qbn_tpu.ops.s2d.pack_weights_s2d) carry one
    masked-ones column per output-parity slot, so the weight-zero-point
    window-sum comes out of the same GEMM;
  * the epilogue (zp correction, scale, bias, round, clamp, quantised
    ReLU, sub-8-bit clamp) runs on the VPU and the kernel stores int8.

The MXU path is bf16 x bf16 -> f32, which is EXACT here: int8 codes are
exactly representable in bf16 and |acc| <= K * 127^2 < 2^24 fits f32's
integer range (asserted below).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qbn_tpu.ops.s2d import pack_weights_s2d, space_to_depth, depth_to_space


def _kernel(scal_ref, bias_ref, x_ref, xsh_ref, w_ref, out_ref, *, cout,
            relu, a_lo, a_hi):
    bb, hp, wp, c4 = x_ref.shape[1:]
    ho, wo = hp - 1, wp - 1
    x = x_ref[0]
    xsh = xsh_ref[0]  # column-shifted copy: xsh[:, :, j, :] = x[:, :, j+1, :]
    # The implicit patch matrix is (m, 4*c4) over the 2x2 packed-pixel
    # window, (a, b)-tap-major (pack_weights_s2d's flattening). Mosaic
    # cannot address lane/sublane-offset slices, so the column+1 neighbour
    # arrives as a pre-shifted input and each tap contributes its own
    # offset-0 dot against the matching weight row-block.
    m = bb * ho * wo
    taps = (x[:, 0:ho, 0:wo, :], xsh[:, 0:ho, :, :],
            x[:, 1:hp, 0:wo, :], xsh[:, 1:hp, :, :])
    acc = jnp.zeros((m, w_ref.shape[-1]), jnp.float32)
    for t, xt in enumerate(taps):
        acc += jnp.dot(xt.reshape(m, c4).astype(jnp.bfloat16),
                       w_ref[0, t * c4:(t + 1) * c4, :].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    # columns: [slot0 couts | slot1 | slot2 | slot3 | 4 winsum columns].
    # Expand the 4 winsum columns to the 4*cout lanes with a tiny static
    # 0/1 matmul — Mosaic-friendly (no lane-dim reshape).
    win = acc[:, 4 * cout:]                                   # (m, 4)
    expand = (jax.lax.broadcasted_iota(jnp.int32, (4, 4 * cout), 1)
              // cout
              == jax.lax.broadcasted_iota(jnp.int32, (4, 4 * cout), 0)
              ).astype(jnp.float32)
    win_x = jnp.dot(win, expand, preferred_element_type=jnp.float32)
    scale = scal_ref[0, 0]       # x_scale * w_scale
    wzp = scal_ref[0, 1]
    out_scale = scal_ref[0, 2]
    out_zp = scal_ref[0, 3]
    y = (acc[:, :4 * cout] - wzp * win_x) * scale
    y = y + bias_ref[0]          # bias pre-tiled to 4*cout
    q = jnp.round(y / out_scale) + out_zp
    q = jnp.clip(q, 0, 255)
    if relu:
        q = jnp.maximum(q, out_zp)
    q = jnp.clip(q, a_lo, a_hi)
    out_ref[0] = (q - out_zp).astype(jnp.int8).reshape(
        bb, ho, wo, 4 * cout)


def mc_conv_packed_s2d(xs2d, w_packed, cout: int, scale_prod, w_zp, bias,
                       out_scale, out_zp, a_lo: int, a_hi: int,
                       relu: bool, block_b: int = 8,
                       interpret: bool = False):
    """Packed-domain fused conv.

    Args:
      xs2d: (S, B, H/2+1, W/2+1, 4*cin) int8 codes (space_to_depth of the
        pad-1 activations).
      w_packed: (S, 16*cin, 4*cout + 4) int8 from pack_weights_s2d.
    Returns (S, B, H/2, W/2, 4*cout) int8 codes (depth_to_space pending).
    """
    s, b, hp, wp, c4 = xs2d.shape
    k = 4 * c4
    assert k * 127 * 127 < 2 ** 24, "int accumulation exceeds exact f32"
    n = w_packed.shape[-1]
    assert n == 4 * cout + 4
    block_b = min(block_b, b)
    pad_b = (-b) % block_b
    if pad_b:
        xs2d = jnp.pad(xs2d, ((0, 0), (0, pad_b)) + ((0, 0),) * 3)
    nb = xs2d.shape[1] // block_b
    xshift = xs2d[:, :, :, 1:, :]  # column+1 neighbour, offset-0 layout

    scal = jnp.stack([
        jnp.asarray(scale_prod, jnp.float32),
        jnp.asarray(w_zp, jnp.float32),
        jnp.asarray(out_scale, jnp.float32),
        jnp.asarray(out_zp, jnp.float32),
    ]).reshape(1, 4)
    bias = jnp.tile(jnp.asarray(bias, jnp.float32).reshape(1, cout),
                    (1, 4))  # per output-parity slot

    kern = functools.partial(_kernel, cout=cout, relu=relu,
                             a_lo=a_lo, a_hi=a_hi)
    out = pl.pallas_call(
        kern,
        grid=(s, nb),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4 * cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, hp, wp, c4),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, hp, wp - 1, c4),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b, hp - 1, wp - 1, 4 * cout),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (s, xs2d.shape[1], hp - 1, wp - 1, 4 * cout), jnp.int8),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(scal, bias, xs2d, xshift, w_packed)
    return out[:, :b]


def mc_group_conv(x_codes, x_scale, w_codes, w_scale, w_zp, bias,
                  out_scale, out_zp, a_lo: int, a_hi: int,
                  relu: bool = False, interpret: bool = False):
    """Per-sample int8 conv, fused: (S, B, H, W, cin) x (S, 3, 3, cin,
    cout) -> (S, B, H, W, cout), for 3x3/stride-1/pad-1 with even H, W.

    The XLA pre/post re-layouts (pad + space_to_depth in, depth_to_space
    out) are int8-only; everything heavy happens in the kernel."""
    s, b, h, w, cin = x_codes.shape
    cout = w_codes.shape[-1]
    assert w_codes.shape[1:3] == (3, 3) and h % 2 == 0 and w % 2 == 0
    xp = jnp.pad(x_codes, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    xs2d = space_to_depth(
        xp.reshape(s * b, h + 2, w + 2, cin)).reshape(
        s, b, (h + 2) // 2, (w + 2) // 2, 4 * cin)
    wp = jax.vmap(lambda w1: pack_weights_s2d(w1, with_winsum=True))(
        w_codes.astype(jnp.int8))
    wp = wp.reshape(s, 16 * cin, 4 * cout + 4)
    bias = jnp.zeros((cout,), jnp.float32) if bias is None else bias
    out = mc_conv_packed_s2d(
        xs2d, wp, cout, x_scale * w_scale, w_zp, bias, out_scale, out_zp,
        a_lo, a_hi, relu, interpret=interpret)
    return depth_to_space(
        out.reshape(s * b, h // 2, w // 2, 4 * cout), cout).reshape(
        s, b, h, w, cout)
