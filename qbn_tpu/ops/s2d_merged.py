"""Stage-resident space-to-depth INT conv for the merged MC layout.

MEASURED NEGATIVE RESULT (TPU v5e, tools/microbench_s2dm.py): slower
than the production native-view merged conv at both stage-1 (packed
pair 1.31+1.16 ms vs 1.00 ms) and stage-2 (0.75 vs 0.46 ms) shapes.
The native-view requant epilogues already lift the unpacked conv to
54-119 useful-TOPS, so the packing's 16/9 MAC overhead and the odd
17^2 psi grid cost more than the extra MXU lanes buy. Kept as a
bitwise-exact library behind QBN_S2D_MERGED=on (default off);
tests/test_s2d_merged.py proves op-level and end-to-end equivalence.

Original premise: the width-24 ResNet stage runs its merged convs
(feature_group_count=S, cin=cout=24) at 24/128 MXU lane occupancy —
the round-1 formulation ceiling (docs/STATUS.md). Packing 2x2
spatial blocks into channels lifts occupancy to 96/128 for 16/9 the
MACs (theoretical 2.25x). The usual blocker is the per-layer re-blocking
transpose; this module removes it with ALTERNATING-PARITY packings:

  phi: block b = rows (2b, 2b+1)      -> 16^2 blocks for a 32^2 image
  psi: block a = rows (2a-1, 2a)      -> 17^2 blocks (half-empty edges)

A 3x3/stride-1/pad-1 conv maps phi->psi with conv padding ((1,1),(1,1))
and psi->phi with no padding, both as STANDARD 2x2 block-space convs:
the input rows a window needs always span exactly two blocks of the
other parity. Kernel taps scatter by u = 2A + p_in - p_out (same 0/1
scatter tensor both directions). Layout changes ride the convs' own
padding config — no pad ops, no transposes between layers.

psi tensors carry the out-of-image rows -1 and H as zero codes (= the
original conv's zero padding, since codes are zero-point-removed); the
phi->psi epilogue multiplies a constant border mask so those positions
stay exactly zero through requant, residual adds (dequant(0)=0 ->
requant -> u=0) and ReLU.

Weights are CENTERED exact-bf16 (see qbn_tpu.ops.integer): the packed
kernel's structural zeros must contribute nothing, so centering happens
BEFORE scattering. Exactness bound: 9*cin*127*254 < 2^24 (cin <= 57).

A residual block chains phi -> psi -> phi, so the add and the block
input share the phi packing. The stem emits phi directly via a 4x4
stride-2 packed-output kernel; the stage exit unpacks once (int8
depth-to-space). Cited reference model: width-24 ResNet-18
(reference: src/models/stochastic/bbb/models_bbb.py:196-211).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from qbn_tpu.ops.integer import _requant_out, _BF16_CENTERED_K

_DN = ("NHWC", "HWIO", "NHWC")


@functools.lru_cache(maxsize=None)
def _scatter(kh: int = 3, kw: int = 3) -> np.ndarray:
    """S[A,B, s_in(p,q), s_out(p',q'), k(u*kw+v)] = 1 where the packed
    2x2 tap (A,B) of input slot (p,q) feeding output slot (p',q') is
    original tap u = 2A + p - p', v = 2B + q - q'."""
    t = np.zeros((2, 2, 4, 4, kh * kw), np.float32)
    for A in range(2):
        for Bb in range(2):
            for p in range(2):
                for q in range(2):
                    for pp in range(2):
                        for qq in range(2):
                            u = 2 * A + p - pp
                            v = 2 * Bb + q - qq
                            if 0 <= u < kh and 0 <= v < kw:
                                t[A, Bb, p * 2 + q, pp * 2 + qq,
                                  u * kw + v] = 1
    return t


@functools.lru_cache(maxsize=None)
def _stem_scatter(kh: int = 3, kw: int = 3) -> np.ndarray:
    """S[U,V, s_out(p',q'), k]: unpacked 4x4 stride-2 tap (U,V) feeding
    packed output slot (p',q') is original tap u = U - p', v = V - q'."""
    t = np.zeros((4, 4, 4, kh * kw), np.float32)
    for U in range(4):
        for V in range(4):
            for pp in range(2):
                for qq in range(2):
                    u, v = U - pp, V - qq
                    if 0 <= u < kh and 0 <= v < kw:
                        t[U, V, pp * 2 + qq, u * kw + v] = 1
    return t


def eligible(kernel_size, strides, padding, cin: int) -> bool:
    return (tuple(kernel_size) == (3, 3) and tuple(strides) == (1, 1)
            and padding == 1 and 9 * cin <= _BF16_CENTERED_K)


def pack_kernel_merged(w_codes, w_zp):
    """(S,3,3,cin,cout) int8 codes -> centered bf16 (2,2,4cin,S*4cout)
    packed block-space kernel (same tensor serves phi->psi and
    psi->phi; only the conv padding differs)."""
    s, kh, kw, cin, cout = w_codes.shape
    wc = w_codes.astype(jnp.float32) - w_zp            # exact centering
    w9 = jnp.moveaxis(wc.reshape(s, kh * kw, cin, cout), 0, 2)
    t = jnp.asarray(_scatter(kh, kw))                  # (2,2,4,4,K)
    pk = jnp.einsum("abijk,kcso->abicjso", t, w9)
    pk = pk.transpose(0, 1, 2, 3, 5, 4, 6).reshape(
        2, 2, 4 * cin, s * 4 * cout)
    return pk.astype(jnp.bfloat16)


def pack_stem_kernel(w_codes, w_zp):
    """(S,3,3,cin,cout) int8 codes -> centered bf16 (4,4,cin,S*4cout):
    the shared-input stem conv that emits phi packing directly
    (stride 2, pad 1 on the original 32^2 grid)."""
    s, kh, kw, cin, cout = w_codes.shape
    wc = w_codes.astype(jnp.float32) - w_zp
    w9 = jnp.moveaxis(wc.reshape(s, kh * kw, cin, cout), 0, 1)
    t = jnp.asarray(_stem_scatter(kh, kw))             # (4,4,4,K)
    pk = jnp.einsum("uvjk,ksco->uvcjso", t, w9)
    pk = pk.transpose(0, 1, 2, 4, 3, 5).reshape(4, 4, cin,
                                                s * 4 * cout)
    return pk.astype(jnp.bfloat16)


def pack_phi(x_codes, s: int):
    """(B, H, W, S*C) -> phi-packed (B, H/2, W/2, S*4*C)."""
    b, h, w, sc = x_codes.shape
    c = sc // s
    x = x_codes.reshape(b, h // 2, 2, w // 2, 2, s, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)
    return x.reshape(b, h // 2, w // 2, s * 4 * c)


def unpack_phi(x_codes, s: int):
    """phi-packed (B, hb, wb, S*4*C) -> (B, 2hb, 2wb, S*C)."""
    b, hb, wb, sfc = x_codes.shape
    c = sfc // (s * 4)
    x = x_codes.reshape(b, hb, wb, s, 2, 2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6)
    return x.reshape(b, 2 * hb, 2 * wb, s * c)


@functools.lru_cache(maxsize=None)
def _psi_mask(hb: int, wb: int, cout: int) -> np.ndarray:
    """(hb, wb, 4*cout) 0/1 mask zeroing the out-of-image psi rows/cols
    (row -1 = block 0 slot p'=0; row H = last block slot p'=1)."""
    row = np.ones((hb, 2), np.float32)
    row[0, 0] = 0.0
    row[hb - 1, 1] = 0.0
    col = np.ones((wb, 2), np.float32)
    col[0, 0] = 0.0
    col[wb - 1, 1] = 0.0
    m = row[:, None, :, None] * col[None, :, None, :]  # (hb, wb, 2, 2)
    m = np.repeat(m.reshape(hb, wb, 4)[..., None], cout, axis=-1)
    return m.reshape(hb, wb, 4 * cout)


def int_conv_s2d_merged(x_codes, x_scale, w_codes, w_scale, w_zp, bias,
                        out_scale, out_zp, a_lo: int, a_hi: int,
                        relu: bool, to_psi: bool):
    """Packed-domain merged conv: phi->psi (to_psi) or psi->phi.

    x_codes: (B, hb, wb, S*4*cin) int8 packed codes (phi: hb=H/2;
    psi: hb=H/2+1). Bit-exact with int_conv_merged on the unpacked
    tensors (same products, f32-exact accumulation, same requant)."""
    s, kh, kw, cin, cout = w_codes.shape
    assert 9 * cin <= _BF16_CENTERED_K
    pk = pack_kernel_merged(w_codes, w_zp)
    pad = ((1, 1), (1, 1)) if to_psi else ((0, 0), (0, 0))
    acc = lax.conv_general_dilated(
        x_codes.astype(jnp.bfloat16), pk, (1, 1), pad,
        dimension_numbers=_DN, feature_group_count=s,
        preferred_element_type=jnp.float32)
    b, ho, wo = acc.shape[:3]
    acc = acc.reshape(b, ho, wo, s, 4 * cout)          # native 5-D view
    bias = jnp.zeros((cout,), jnp.float32) if bias is None else bias
    out = _requant_out(acc * (x_scale * w_scale), jnp.tile(bias, 4),
                       out_scale, out_zp, relu, a_lo, a_hi)
    if to_psi:
        # zero the out-of-image border so downstream convs see the
        # original zero padding (constant mask, fuses into the epilogue)
        mask = jnp.asarray(_psi_mask(ho, wo, cout), jnp.int8)
        out = out * mask[:, :, None, :]
    out = lax.optimization_barrier(out)
    return out.reshape(b, ho, wo, s * 4 * cout)


def int_conv_s2d_stem(x, x_scale, w_codes, w_scale, w_zp, bias,
                      out_scale, out_zp, a_lo: int, a_hi: int,
                      relu: bool):
    """Shared-input stem conv emitting phi packing directly: one 4x4
    stride-2 pad-1 conv on the unpacked (B, H, W, cin) codes, output
    (B, H/2, W/2, S*4*cout)."""
    s, kh, kw, cin, cout = w_codes.shape
    assert 9 * cin <= _BF16_CENTERED_K
    pk = pack_stem_kernel(w_codes, w_zp)
    acc = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), pk, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32) if bias is None else bias
    out = _requant_out(acc * (x_scale * w_scale),    # native 4-D view
                       jnp.tile(bias, 4 * s), out_scale, out_zp, relu,
                       a_lo, a_hi)
    out = lax.optimization_barrier(out)
    return out
