"""Persistent-layout fused int8 MC conv (Pallas TPU): the deep-layer hot op.

MC evaluation of converted Bayesian ResNets spends its time in S
per-posterior-sample 3x3/stride-1/pad-1 convs per layer (reference int
path: src/models/stochastic/bbb/quantized/conv_q.py:107-125 on FBGEMM).
The XLA formulation (qbn_tpu.ops.integer._conv_core) computes the conv
itself at ~65-70 TOPS on a v5e but then pays a ~3.4 ms int8 sample-axis
transpose per layer (tools/microbench_conv2.py) because vmap semantics
demand (S, B, H, W, C) outputs from a (B, H, W, S*C)-layout conv.

This kernel removes BOTH the narrow-channel MXU starvation and every
inter-layer transpose by keeping activations in a *persistent packed
layout* across a whole stack of stride-1 convs:

    (S, E, E, B, 4*cin) int8, zero-point-removed codes,

where spatial 2x2 pixel blocks are packed into channels (4x lane
occupancy; cf. qbn_tpu.ops.s2d) and the packed-block grid ALTERNATES
between two half-pixel-shifted tilings:

  phase 0 ("aligned"):  block k=1..H/2 holds pixel rows (2k-2, 2k-1);
                        blocks 0 and E-1 are zeros (E = H/2 + 2).
  phase 1 ("shifted"):  block k=0..H/2 holds pixel rows (2k-1, 2k)
                        (out-of-range pixels = zero); block E-1 zeros.

A pad-1 3x3 conv maps phase-0 input to phase-1 output (and vice versa)
using only FOUR tap GEMMs whose operands are whole-block slices at
*leading* (untiled) dimensions — output block t consumes input blocks
{t, t+1} in each spatial dim, so under this storage no sublane/lane
shift, no im2col, and no transpose ever materialises. The tap weights
are exactly the space-to-depth packed kernel (qbn_tpu.ops.s2d.
pack_weights_s2d: scatter a=(di+u)//2 == tap index), shared by both
phases by translation invariance; its 4 masked-ones columns give the
weight-zero-point window sum in the same GEMM.

Batch lives in the sublane dim ((..., B, C) with B a multiple of the
tile), samples in the grid — the kernel writes (S, ...) directly. The
MXU path casts int8 codes to bf16 (exact: |acc| <= 9*cin*127^2 < 2^24
for cin <= 96, asserted), the requant epilogue (zero-point correction,
scale, bias, round, clamp, quantised ReLU, sub-8-bit clamp) runs on the
VPU in the same kernel, and the output is int8 codes in the opposite
phase — ready to be the next conv's input unchanged.

Boundary invariant: boundary blocks are EXACT zeros in every tensor in
this layout (zero-point-removed codes make zero == activation zero
point, FBGEMM's pad semantics); elementwise ops (residual add, ReLU,
dropout masks) preserve it, so whole residual stages run packed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qbn_tpu.ops.s2d import pack_weights_s2d

# bf16 MXU operands are exact while the integer accumulator fits f32
# (see qbn_tpu.ops.integer._BF16_EXACT_K): 9*cin*127^2 < 2^24 <=> cin<=115.
_MAX_BF16_CIN = (1 << 24) // (9 * 127 * 127)


def extent(h: int) -> int:
    """Storage extent E for spatial size h (even)."""
    assert h % 2 == 0
    return h // 2 + 2


def pack_codes(codes, phase: int):
    """(B, H, W, C) int8 codes -> (E, E, B, 4C) packed storage of `phase`.

    phase 0: aligned tiling (zero blocks at both ends);
    phase 1: shifted tiling (block k = pixel rows 2k-1, 2k).
    """
    b, h, w, c = codes.shape
    if phase == 0:
        pads = ((2, 2), (2, 2))
    else:
        pads = ((1, 3), (1, 3))
    x = jnp.pad(codes, ((0, 0), pads[0], pads[1], (0, 0)))
    e1, e2 = (h + 4) // 2, (w + 4) // 2
    x = x.reshape(b, e1, 2, e2, 2, c)
    x = x.transpose(1, 3, 0, 2, 4, 5)           # (E, E, B, 2, 2, C)
    return x.reshape(e1, e2, b, 4 * c)


def unpack_codes(packed, phase: int):
    """(E, E, B, 4C) -> (B, H, W, C), inverse of pack_codes."""
    e1, e2, b, c4 = packed.shape
    c = c4 // 4
    h, w = (e1 - 2) * 2, (e2 - 2) * 2
    x = packed.reshape(e1, e2, b, 2, 2, c)
    x = x.transpose(2, 0, 3, 1, 4, 5).reshape(b, 2 * e1, 2 * e2, c)
    if phase == 0:
        return x[:, 2:2 + h, 2:2 + w]
    return x[:, 1:1 + h, 1:1 + w]


def pack_weights(w_codes):
    """(3, 3, cin, cout) int8 -> (4, 4cin, 4cout + 4) tap matrices.

    Identical scatter to qbn_tpu.ops.s2d.pack_weights_s2d (with winsum
    columns); tap index t = 2*dh + dw."""
    p = pack_weights_s2d(w_codes, with_winsum=True)    # (2,2,4cin,4cout+4)
    return p.reshape(4, p.shape[2], p.shape[3])


def _bconv_kernel(scal_ref, bias_ref, x_ref, w_ref, o_ref, *,
                  e, bb, c, cout, n, phase, relu, a_lo, a_hi,
                  cast_whole):
    """One (sample, batch-block) cell: full (E, E) spatial extent.

    x_ref:   (1, E, E, bb, c)   int8 codes, input phase
    w_ref:   (1, 4, c, n)       int8 packed taps (n = 4*cout + 4)
    o_ref:   (1, E, E, bb, 4*cout) int8 codes, output phase = 1 - phase
    scal_ref (SMEM): [mul (=sx*sw/sy), wzp, out_zp]
    bias_ref: (1, 4*cout) f32, bias/sy pre-tiled over the 4 output slots
    """
    n_out = e - 1 - phase          # output blocks per dim
    off = phase                    # write offset into storage
    mul = scal_ref[0, 0]
    wzp = scal_ref[0, 1]
    ozp = scal_ref[0, 2]
    bias = bias_ref[0]

    # static 0/1 expander: winsum slot -> the 4*cout output lanes
    expand = (jax.lax.broadcasted_iota(jnp.int32, (4, 4 * cout), 1) // cout
              == jax.lax.broadcasted_iota(jnp.int32, (4, 4 * cout), 0)
              ).astype(jnp.float32)

    if cast_whole:
        x = x_ref[0].astype(jnp.bfloat16)       # (E, E, bb, c)
    w = [w_ref[0, t].astype(jnp.bfloat16) for t in range(4)]

    zero_row = jnp.zeros((e, bb, 4 * cout), jnp.int8)
    if phase == 1:
        o_ref[0, 0] = zero_row
    o_ref[0, e - 1] = zero_row

    m = n_out * bb
    # Phase-0 output is the shifted tiling: its end blocks are HALF
    # out-of-range (pixel -1 in slot parity 0 of block 0, pixel H in slot
    # parity 1 of block n_out-1). Those slots must be EXACT zeros — they
    # are the next conv's implicit padding — but the GEMM computes real
    # conv values there (the window overlaps in-range pixels), so the
    # epilogue masks them. Phase-1 output (aligned tiling) has no
    # half-blocks. Lane layout: slot d = 2*ph + pw, channel-fastest.
    w_edge_mask = None
    if phase == 0:
        lane = jax.lax.broadcasted_iota(jnp.int32, (m, 4 * cout), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (m, 4 * cout), 0) // bb
        pw = (lane // cout) % 2
        ph_s = (lane // cout) // 2
        w_edge_mask = jnp.logical_not(
            ((row == 0) & (pw == 0)) | ((row == n_out - 1) & (pw == 1)))
        h_first_mask = jnp.logical_not(ph_s == 0)
        h_last_mask = jnp.logical_not(ph_s == 1)
    for oh in range(n_out):
        acc = jnp.zeros((m, n), jnp.float32)
        for dh in range(2):
            for dw in range(2):
                if cast_whole:
                    xt = x[oh + dh, dw:dw + n_out]
                else:
                    xt = x_ref[0, oh + dh, dw:dw + n_out].astype(
                        jnp.bfloat16)
                acc += jnp.dot(xt.reshape(m, c), w[2 * dh + dw],
                               preferred_element_type=jnp.float32)
        win = jnp.dot(acc[:, 4 * cout:4 * cout + 4], expand,
                      preferred_element_type=jnp.float32)
        y = (acc[:, :4 * cout] - wzp * win) * mul + bias
        q = jnp.round(y) + ozp
        q = jnp.clip(q, 0., 255.)
        if relu:
            q = jnp.maximum(q, ozp)
        q = jnp.clip(q, float(a_lo), float(a_hi))
        u_f = q - ozp
        if phase == 0:
            mask = w_edge_mask
            if oh == 0:
                mask = mask & h_first_mask
            if oh == n_out - 1:
                mask = mask & h_last_mask
            u_f = jnp.where(mask, u_f, 0.)
        u = u_f.astype(jnp.int8).reshape(n_out, bb, 4 * cout)
        row = jnp.zeros((e, bb, 4 * cout), jnp.int8)
        row = lax.dynamic_update_slice(row, u, (off, 0, 0))
        o_ref[0, oh + off] = row

    # In-kernel zeroing of the boundary columns happened via `row` above;
    # boundary rows were written before the loop.


def _bconv_call(x_packed, w_packed, mul, wzp, bias_over_sy, out_zp,
                cout: int, phase: int, relu: bool, a_lo: int, a_hi: int,
                bb: int | None = None, cast_whole: bool = True,
                interpret: bool = False):
    """(S, E, E, B, c) int8 x (S, 4, c, n) int8 -> (S, E, E, B, 4cout)."""
    s, e, e2, b, c = x_packed.shape
    assert e == e2
    n = w_packed.shape[-1]
    assert n == 4 * cout + 4 and w_packed.shape[1:3] == (4, c)
    if bb is None:
        # target <= ~2.5 MB per x block
        bb = max(32, min(b, (2_500_000 // max(1, e * e * c))
                         // 32 * 32))
    while b % bb:
        bb //= 2
    nb = b // bb

    scal = jnp.stack([jnp.asarray(mul, jnp.float32),
                      jnp.asarray(wzp, jnp.float32),
                      jnp.asarray(out_zp, jnp.float32)]).reshape(1, 3)
    bias4 = jnp.tile(jnp.asarray(bias_over_sy, jnp.float32
                                 ).reshape(1, cout), (1, 4))

    kern = functools.partial(
        _bconv_kernel, e=e, bb=bb, c=c, cout=cout, n=n, phase=phase,
        relu=relu, a_lo=a_lo, a_hi=a_hi, cast_whole=cast_whole)
    return pl.pallas_call(
        kern,
        grid=(s, nb),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4 * cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e, e, bb, c), lambda i, j: (i, 0, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, c, n), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, e, e, bb, 4 * cout),
                               lambda i, j: (i, 0, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, e, e, b, 4 * cout), jnp.int8),
        interpret=(pltpu.InterpretParams() if interpret else False),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(scal, bias4, x_packed, w_packed)


def bconv(x_packed, x_scale, w_codes, w_scale, w_zp, bias, out_scale,
          out_zp, a_lo: int, a_hi: int, phase: int, relu: bool = False,
          bb: int | None = None, interpret: bool = False):
    """Fused quantised 3x3/stride-1/pad-1 MC conv in persistent packed
    layout.

    Args:
      x_packed: (S, E, E, B, 4*cin) int8 zero-point-removed codes in
        `phase` storage (pack_codes).
      w_codes: (S, 3, 3, cin, cout) int8 per-sample weight codes.
    Returns (S, E, E, B, 4*cout) int8 codes in `1 - phase` storage,
    numerically identical to qbn_tpu.ops.integer.int_conv.
    """
    s = x_packed.shape[0]
    cin, cout = w_codes.shape[-2], w_codes.shape[-1]
    assert cin <= _MAX_BF16_CIN, "bf16 accumulation would lose exactness"
    assert x_packed.shape[-1] == 4 * cin
    w_packed = jax.vmap(pack_weights)(w_codes.astype(jnp.int8))
    bias = jnp.zeros((cout,), jnp.float32) if bias is None else bias
    mul = jnp.asarray(x_scale, jnp.float32) * w_scale / out_scale
    return _bconv_call(
        x_packed, w_packed, mul, w_zp,
        jnp.asarray(bias, jnp.float32) / out_scale, out_zp, cout,
        int(phase), bool(relu), int(a_lo), int(a_hi), bb=bb,
        interpret=interpret)
