"""Integer inference kernels: int8 MXU dense / conv, one MXU pass each.

TPU-native replacement for the FBGEMM int8 CPU kernels behind the
reference's converted models (reference: src/models/stochastic/bbb/
quantized/linear_q.py:93, conv_q.py:120-125).

Representation: activations travel as ZERO-POINT-REMOVED int8 codes
u = q - zp, where q is the uint8-convention code with zero point zp (so
dequant(u) = u * scale). This fits int8 exactly because the reference
caps activation precision at 7 bits (assert 2 <= a <= 7,
src/quant_utils.py:120): q in [0, 127] and zp in [0, 127] give
u in [-127, 127]. Two consequences that make the int path one MXU op:

  * the activation-side zero-point corrections vanish (u IS the centered
    operand), and zero padding in conv is exactly FBGEMM's
    pad-with-activation-zero-point semantics (u = 0 <=> q = zp);
  * only the weight zero point zw remains:
        dense:  u . (w - zw) = dot(u, w) - zw * rowsum(u)
        conv:   u * (w - zw) = conv(u, w) - zw * winsum(u)
    where winsum comes from a SEPARATE one-output-channel ones conv
    (negligible MXU work). Appending the ones channel to the main conv
    would share the MXU pass but the output slice breaks the conv's
    requant output fusion on TPU — the raw f32/s32 accumulator (4x the
    int8 bytes) materialises in HBM (tools/dump_hlo.py evidence).
    Where the contraction is shallow enough the weights are instead
    CENTERED in exact bf16 and the correction vanishes entirely.

Requantisation: q_out = clamp(round((acc*sx*sw + bias)/sy) + zy, 0, 255),
quantised ReLU = max(q, zy), then the sub-8-bit clamp (reference
clamp_activation, src/utils.py:25-31); emitted as u_out = q_out - zy.
All of it is elementwise and fuses into the conv epilogue under XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching, lax

_DN = ("NHWC", "HWIO", "NHWC")

# Contraction-depth bound for EXACT bf16 convolution of int8 codes:
# products of int8-valued bf16 operands are exact in the f32 accumulator,
# and the accumulated integer stays exact while K * 127^2 < 2^24. XLA's
# bf16 conv lowering measures ~1.35x faster than its int8 one on v5e
# (tools/microbench_conv.py), so casting is a free win where exact.
_BF16_EXACT_K = (1 << 24) // (127 * 127)

# Stronger trick for shallow contractions: CENTER the weights instead of
# correcting with a window-sum. |w - zw| <= 254 < 2^8 is still exact in
# bf16, products |u (w - zw)| <= 127*254 are exact in f32, and the
# accumulated integer stays exact while K * 127 * 254 < 2^24 (K <= 520) —
# which covers the width-24/48 ResNet stages (K = 9*cin <= 432) and both
# LeNet convs. The weight-zero-point correction then VANISHES: no
# masked-ones channel, no winsum subtract, and the whole requant epilogue
# fuses into the conv (measured ~1.6x on the stage-1 merged layer,
# tools/microbench_merged_op.py).
_BF16_CENTERED_K = (1 << 24) // (254 * 127)


def _centered_weights(w8, w_zp):
    """int8 weight codes -> EXACT bf16 centered weights (w - zw)."""
    return (w8.astype(jnp.float32) - w_zp).astype(jnp.bfloat16)


# Shallow-cin im2col (QBN_IM2COL=on, DEFAULT OFF — measured dead end):
# the hypothesis was that XLA's conv lowering contracts only ~cin lanes
# per MXU pass, so materialising kh*kw patches (a 1x1 conv contracting
# K = kh*kw*cin) should win up to kh*kw x for tiny cin. MEASURED on the
# real v5e: XLA's conv already beats the explicit-patch formulation at
# every shallow shape — CIFAR stem (cin=3, shared-x merged) 0.518 ms vs
# 0.598 ms im2col; LeNet conv1 (cin=1, 5x5) 0.366 ms vs 0.424 ms — i.e.
# the lowering does its own small-cin packing and the patch
# materialisation only adds traffic. Kept flag-gated + bitwise-tested
# (tests/test_int_conv.py::test_im2col_shallow_cin_bitwise) as the
# measurement that justifies trusting XLA's conv here; see also
# tools/microbench_wfold.py for the grouped-conv variant of the same
# negative result (kw-tap folding: 0.90 -> 2.05 ms at stage-1 shapes).
_IM2COL_MAX_K = 128


def _use_im2col(kh, kw, cin):
    import os
    if os.environ.get("QBN_IM2COL", "off") != "on":
        return False
    return kh * kw > 1 and kh * kw * cin <= _IM2COL_MAX_K


def _im2col(x, kh, kw, strides, padding):
    """(B, H, W, C) -> (B, H', W', kh*kw*C) patch tensor.

    Patch order (dh-major, dw, then C fastest) matches the
    (kh, kw, cin, N) -> (kh*kw*cin, N) weight reshape, so
    conv(x, w) == conv1x1(_im2col(x), w.reshape(1, 1, kh*kw*cin, N))
    exactly (integer-valued operands: f32/bf16 accumulation order is
    irrelevant under the 2^24 exactness bounds)."""
    x = jnp.pad(x, ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    cols = []
    for dh in range(kh):
        for dw in range(kw):
            cols.append(x[:, dh:h - kh + 1 + dh:strides[0],
                          dw:w - kw + 1 + dw:strides[1], :])
    return jnp.concatenate(cols, axis=-1)


def _conv_operands(x8, w8, k: int):
    """Pick the fastest EXACT MXU dtype for an int8 conv contraction."""
    if k <= _BF16_EXACT_K:
        return (x8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16),
                jnp.float32)
    return x8, w8, jnp.int32


def _dot_operands(x8, w8, k: int):
    """Like _conv_operands, for dot/einsum contractions. The CPU backend
    cannot execute batched bf16 x bf16 -> f32 dots (DotThunk); f32
    operands are equally exact for int8-valued codes under the same
    2^24 accumulator bound."""
    if k > _BF16_EXACT_K:
        return x8, w8, jnp.int32
    dt = (jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32)
    return x8.astype(dt), w8.astype(dt), jnp.float32


def _requant_out(acc_f32, bias, out_scale, out_zp, relu, a_lo, a_hi):
    """Float-requantise an accumulator to zero-point-removed int8 codes."""
    y = acc_f32
    if bias is not None:
        y = y + bias
    q = jnp.round(y / out_scale) + out_zp
    q = jnp.clip(q, 0, 255)
    if relu:
        q = jnp.maximum(q, out_zp)  # quantised ReLU: max(code, zp)
    q = jnp.clip(q, a_lo, a_hi)
    return (q - out_zp).astype(jnp.int8)


def _int_dense_impl(x_codes, x_scale, w8, w_scale, w_zp, bias,
                    out_scale, out_zp, a_lo, a_hi, relu):
    xo, wo_, acct = _conv_operands(x_codes, w8, x_codes.shape[-1])
    acc = lax.dot_general(xo, wo_, (((1,), (0,)), ((), ())),
                          preferred_element_type=acct)
    rowsum = jnp.sum(x_codes.astype(jnp.int32), axis=-1, keepdims=True)
    acc_f = (acc - w_zp * rowsum).astype(jnp.float32) * (x_scale * w_scale)
    return _requant_out(acc_f, bias, out_scale, out_zp, relu, a_lo, a_hi)


@functools.lru_cache(maxsize=None)
def _dense_core(a_lo: int, a_hi: int, relu: bool):
    """custom_vmap'd dense core: when only the WEIGHTS carry the vmapped
    (MC-sample) axis, all samples' outputs come out of ONE gemm with
    N = S*features, requantised to int8 BEFORE the sample axis is moved
    out front — the int32 (S, B, N) intermediate never exists."""

    @custom_batching.custom_vmap
    def core(x, xs, w8, ws, wzp, bias, os_, ozp):
        return _int_dense_impl(x, xs, w8, ws, wzp, bias, os_, ozp,
                               a_lo, a_hi, relu)

    @core.def_vmap
    def _rule(axis_size, in_batched, x, xs, w8, ws, wzp, bias, os_, ozp):
        xb, xsb, wb, wsb, wzpb, bb, osb, ozpb = in_batched
        simple = (wb and not any((xb, xsb, wsb, wzpb, bb, osb, ozpb)))
        if not simple:
            return jax.vmap(
                lambda *a: _int_dense_impl(*a, a_lo, a_hi, relu),
                in_axes=tuple(0 if b else None for b in in_batched)
            )(x, xs, w8, ws, wzp, bias, os_, ozp), True
        s = axis_size
        k, n = w8.shape[1], w8.shape[2]
        wm = jnp.moveaxis(w8, 0, 1).reshape(k, s * n)  # (K, S, N) S-major
        xo, wo_, acct = _conv_operands(x, wm, k)
        acc = lax.dot_general(xo, wo_, (((1,), (0,)), ((), ())),
                              preferred_element_type=acct)
        rowsum = jnp.sum(x.astype(jnp.int32), axis=-1, keepdims=True)
        acc = acc.reshape(x.shape[0], s, n) - (wzp * rowsum)[..., None]
        acc_f = acc.astype(jnp.float32) * (xs * ws)
        out = _requant_out(acc_f, bias, os_, ozp, relu, a_lo, a_hi)
        return jnp.moveaxis(out, 1, 0), True  # int8 transpose

    return core


def int_dense(x_codes, x_scale, x_zp, w_codes, w_scale, w_zp, bias,
              out_scale, out_zp, a_lo: int, a_hi: int, relu: bool = False):
    """Quantised dense layer on zero-point-removed int8 activation codes.

    Args:
      x_codes: (B, K) int8 codes u = q - zp.
      w_codes: (K, N) int8 weight codes (int8 or int32 carrying int8 range).
    Returns (B, N) codes u_out = q_out - out_zp.
    """
    core = _dense_core(int(a_lo), int(a_hi), bool(relu))
    bias = jnp.zeros((w_codes.shape[-1],), jnp.float32) if bias is None \
        else bias
    return core(x_codes, jnp.asarray(x_scale, jnp.float32),
                w_codes.astype(jnp.int8),
                jnp.asarray(w_scale, jnp.float32),
                jnp.asarray(w_zp, jnp.float32), bias,
                jnp.asarray(out_scale, jnp.float32),
                jnp.asarray(out_zp, jnp.float32))


def _int_conv_impl(x_codes, x_scale, w8, w_scale, w_zp, bias, out_scale,
                   out_zp, strides, padding, a_lo, a_hi, relu):
    kh, kw, cin, cout = w8.shape
    if kh * kw * cin <= _BF16_CENTERED_K:
        wc = _centered_weights(w8, w_zp)
        xb = x_codes.astype(jnp.bfloat16)
        if _use_im2col(kh, kw, cin):
            xb = _im2col(xb, kh, kw, strides, padding)
            wc = wc.reshape(1, 1, kh * kw * cin, cout)
            strides, padding = (1, 1), ((0, 0), (0, 0))
        acc = lax.conv_general_dilated(
            xb, wc, strides, padding, dimension_numbers=_DN,
            preferred_element_type=jnp.float32)
        return _requant_out(acc * (x_scale * w_scale), bias, out_scale,
                            out_zp, relu, a_lo, a_hi)
    # SEPARATE one-channel window-sum conv: an appended ones channel
    # would share the MXU pass, but slicing the (cout+1)-channel output
    # forces the raw accumulator to materialise and the requant cannot
    # fuse into the conv (see int_conv_merged's deep branch).
    xo, wo_, acct = _conv_operands(x_codes, w8, kh * kw * cin)
    acc = lax.conv_general_dilated(
        xo, wo_, strides, padding, dimension_numbers=_DN,
        preferred_element_type=acct)
    ones_k = jnp.ones((kh, kw, cin, 1), wo_.dtype)
    winsum = lax.conv_general_dilated(
        xo, ones_k, strides, padding, dimension_numbers=_DN,
        preferred_element_type=acct)
    acc_f = (acc - w_zp * winsum).astype(jnp.float32) * (x_scale * w_scale)
    return _requant_out(acc_f, bias, out_scale, out_zp, relu, a_lo, a_hi)


@functools.lru_cache(maxsize=None)
def _conv_core(strides, padding, a_lo: int, a_hi: int, relu: bool):
    """custom_vmap'd conv core. MC evaluation vmaps the model over
    per-sample weights with a SHARED activation; the default batching rule
    emits one conv to (B, H', W', S*cout) int32 followed by a transpose of
    the int32 accumulator — at stage-1 ResNet shapes that transpose costs
    more than the conv (measured 5.07 ms vs 1.80 ms for conv+requant).
    This rule requantises in the merged layout first, so only int8 codes
    get transposed, and computes the x-window-sum once for ALL samples
    (it depends only on x)."""

    @custom_batching.custom_vmap
    def core(x, xs, w8, ws, wzp, bias, os_, ozp):
        return _int_conv_impl(x, xs, w8, ws, wzp, bias, os_, ozp,
                              strides, padding, a_lo, a_hi, relu)

    @core.def_vmap
    def _rule(axis_size, in_batched, x, xs, w8, ws, wzp, bias, os_, ozp):
        xb, xsb, wb, wsb, wzpb, bb, osb, ozpb = in_batched
        rest = (xsb, wsb, wzpb, bb, osb, ozpb)
        s = axis_size

        if wb and not xb and not any(rest):
            # shared activation (the first conv of the MC chain): all
            # samples' outputs from ONE conv, N = S*cout
            _, kh, kw, cin, cout = w8.shape
            wm = jnp.moveaxis(w8, 0, 3).reshape(kh, kw, cin, s * cout)
            k = kh * kw * cin
            if k <= _BF16_CENTERED_K:
                # centered weights: no window-sum correction needed
                wc = _centered_weights(wm, wzp)
                xb = x.astype(jnp.bfloat16)
                st, pd = strides, padding
                if _use_im2col(kh, kw, cin):
                    xb = _im2col(xb, kh, kw, st, pd)
                    wc = wc.reshape(1, 1, k, s * cout)
                    st, pd = (1, 1), ((0, 0), (0, 0))
                acc = lax.conv_general_dilated(
                    xb, wc, st, pd, dimension_numbers=_DN,
                    preferred_element_type=jnp.float32)
                b, ho, wo = acc.shape[:3]
                acc_f = (acc.reshape(b, ho, wo, s, cout) * (xs * ws))
            else:
                # x window-sum is sample-independent -> one separate
                # 1-channel winsum conv (an appended channel would break
                # the conv's requant output fusion — see _int_conv_impl)
                xo, wo_, acct = _conv_operands(x, wm, k)
                acc = lax.conv_general_dilated(
                    xo, wo_, strides, padding, dimension_numbers=_DN,
                    preferred_element_type=acct)
                b, ho, wo = acc.shape[:3]
                acc = acc.reshape(b, ho, wo, s, cout)
                ones_k = jnp.ones((kh, kw, cin, 1), wo_.dtype)
                winsum = lax.conv_general_dilated(
                    xo, ones_k, strides, padding, dimension_numbers=_DN,
                    preferred_element_type=acct)      # (B, H', W', 1)
                acc = acc - (wzp * winsum)[..., None]
                acc_f = acc.astype(jnp.float32) * (xs * ws)
            out = _requant_out(acc_f, bias, os_, ozp, relu, a_lo, a_hi)
            return jnp.moveaxis(out, 3, 0), True    # int8 transpose

        if wb and xb and not any(rest):
            # per-sample activations AND weights (deep MC layers): one
            # batch-grouped conv — batch group s (rows [s*B, (s+1)*B)) is
            # convolved with filter group s; measured ~2x over the default
            # both-batched vmap lowering (tools/microbench_conv.py).
            sb = x.shape[0] * x.shape[1]
            xg = x.reshape((sb,) + x.shape[2:])     # free: S-major
            _, kh, kw, cin, cout = w8.shape
            wm = jnp.moveaxis(w8, 0, 3)             # (kh, kw, cin, S, cout)
            k = kh * kw * cin
            if k <= _BF16_CENTERED_K:
                # centered weights: no window-sum correction needed
                wc = _centered_weights(
                    wm.reshape(kh, kw, cin, s * cout), wzp)
                acc = lax.conv_general_dilated(
                    xg.astype(jnp.bfloat16), wc, strides, padding,
                    dimension_numbers=_DN, batch_group_count=s,
                    preferred_element_type=jnp.float32)
                b, ho, wo = acc.shape[:3]
                acc_f = acc.reshape(b, ho, wo, s, cout) * (xs * ws)
            else:
                # per-sample window-sums from a separate batch-grouped
                # 1-channel-per-group conv (an appended channel would
                # break the conv's requant output fusion)
                wg = wm.reshape(kh, kw, cin, s * cout)
                xo, wo_, acct = _conv_operands(xg, wg, k)
                acc = lax.conv_general_dilated(
                    xo, wo_, strides, padding, dimension_numbers=_DN,
                    batch_group_count=s, preferred_element_type=acct)
                b, ho, wo = acc.shape[:3]
                acc = acc.reshape(b, ho, wo, s, cout)
                ones_k = jnp.ones((kh, kw, cin, s), wo_.dtype)
                winsum = lax.conv_general_dilated(
                    xo, ones_k, strides, padding, dimension_numbers=_DN,
                    batch_group_count=s, preferred_element_type=acct)
                acc = acc - wzp * winsum[..., None]  # (B,H',W',S) bcast
                acc_f = acc.astype(jnp.float32) * (xs * ws)
            out = _requant_out(acc_f, bias, os_, ozp, relu, a_lo, a_hi)
            return jnp.moveaxis(out, 3, 0), True    # int8 transpose

        if xb and not wb and not any(rest):
            # per-sample activations, SHARED weights (MC-Dropout:
            # deterministic weights, per-sample masked activations —
            # reference src/models/stochastic/mcdropout/dropout.py:24-39
            # semantics): fold the sample axis into the conv batch and
            # run ONE plain full-width conv — no feature groups, so no
            # per-group cout starvation — with the requant epilogue in
            # the conv's NATIVE 4-D view. The default vmap lowering
            # below also folds the batch, but rebases the epilogue into
            # the unfolded 5-D (S, B, ...) view — a bitcast the conv
            # output fusion refuses to cross (FUSION CONTRACT in
            # int_conv_merged), and the raw f32 accumulator then
            # materialises at 4x the int8 bytes. The int8 output unfolds
            # back to (S, B, ...) behind an optimization_barrier so
            # XLA's reshape-mover cannot hoist the unfold into the
            # epilogue.
            b = x.shape[1]
            out = _int_conv_impl(x.reshape((s * b,) + x.shape[2:]),
                                 xs, w8, ws, wzp, bias, os_, ozp,
                                 strides, padding, a_lo, a_hi, relu)
            out = lax.optimization_barrier(out)
            return out.reshape((s, b) + out.shape[1:]), True

        return jax.vmap(
            lambda *a: _int_conv_impl(*a, strides, padding,
                                      a_lo, a_hi, relu),
            in_axes=tuple(0 if b else None for b in in_batched)
        )(x, xs, w8, ws, wzp, bias, os_, ozp), True

    return core


def int_conv_merged(x_codes, x_scale, w_codes, w_scale, w_zp, bias,
                    out_scale, out_zp, strides, padding,
                    a_lo: int, a_hi: int, relu: bool = False,
                    shared_x: bool = False, residual=None,
                    res_scale=None, res_out_scale=None, res_out_zp=None,
                    res_relu: bool = False):
    """All-samples quantised conv in the MERGED channel layout.

    The transpose-free MC evaluation path: activations stay
    (B, H, W, S*C) for the whole network (the stem's merged conv
    produces this layout and feature_group_count=S convs preserve it),
    so the int8 sample-axis transpose that dominates the vmapped
    formulation (3.4 ms/layer at stage-1 ResNet shapes,
    tools/microbench_conv2.py) never exists.

    Args:
      x_codes: (B, H, W, S*cin) int8 zero-point-removed codes, or
        (B, H, W, cin) when shared_x (the stem: one image, S weights).
      w_codes: (S, kh, kw, cin, cout) int8 per-sample weight codes.
    Returns (B, H', W', S*cout) int8 codes.

    The weight-zero-point window sum (deep-contraction path only) comes
    from a separate one-channel-per-group ones conv so the main conv's
    requant epilogue stays fusable; shallow contractions use centered
    bf16 weights and need no correction at all.

    residual (optional): (B, H', W', S*cout) int8 codes of
    a residual-add operand at scale res_scale. The whole quantised add
    (requant to this conv's grid -> dequant both -> add -> requant to
    the add observer's res_out_scale/zp grid, optional quantised ReLU)
    runs INSIDE the conv's epilogue — bit-identical to the standalone
    ResidualAdd+relu kernels, but the conv's own int8 output never
    round-trips through HBM (the separate add kernel's read+write of it
    disappears). Equivalent of FBGEMM's fused add_relu consuming a conv
    output (reference: src/models/stochastic/bbb/quantized/
    models_q.py BasicBlockQ.forward add_relu usage).
    """
    s, kh, kw, cin, cout = w_codes.shape
    w8 = w_codes.astype(jnp.int8)
    k = kh * kw * cin
    fgc = 1 if shared_x else s
    # FUSION CONTRACT (HLO evidence via tools/dump_hlo.py): the requant
    # epilogue only fuses into the conv when it runs in the conv's
    # NATIVE output view — 4-D (B,H',W',S*cout) for an ungrouped conv,
    # 5-D (B,H',W',S,cout) for feature_group_count=S (which TPU lowers
    # as a base-dilated conv with the group axis as a third window dim).
    # A view change between conv and requant becomes a bitcast the conv
    # output fusion refuses to cross, and the raw f32 accumulator then
    # materialises at 4x the int8 bytes. The optimization_barrier before
    # the final flatten stops XLA's reshape-mover from hoisting that
    # flatten INTO the epilogue when more elementwise ops (a residual
    # add) follow downstream — exactly the rebasing that caused the f32
    # materialisation.
    bias = jnp.zeros((cout,), jnp.float32) if bias is None else bias

    def _fuse_res(out, res):
        """Quantised residual add + optional ReLU, in the conv's native
        view (res is the (B,H',W',S*cout) operand reshaped to match)."""
        y = (out.astype(jnp.float32) * out_scale
             + res.astype(jnp.float32) * res_scale)
        return _requant_out(y, None, res_out_scale, res_out_zp,
                            res_relu, a_lo, a_hi)

    def _epilogue_5d(acc_f, b, ho, wo):
        """Requant (+ fused residual add) in the native 5-D view."""
        out = _requant_out(acc_f, bias, out_scale, out_zp, relu,
                           a_lo, a_hi)
        if residual is not None:
            out = _fuse_res(out, residual.reshape(b, ho, wo, s, cout))
        return out

    def _epilogue_4d(acc_f):
        """Requant (+ fused residual add) in the native 4-D view
        (fgc == 1: the shared-x stem, or a single-sample merge)."""
        out = _requant_out(acc_f, jnp.tile(bias, s), out_scale, out_zp,
                           relu, a_lo, a_hi)
        if residual is not None:
            out = _fuse_res(out, residual)
        return out

    if k <= _BF16_CENTERED_K:
        # centered-weight path: the zero-point correction vanishes
        wc = _centered_weights(
            jnp.moveaxis(w8, 0, 3).reshape(kh, kw, cin, s * cout), w_zp)
        xb = x_codes.astype(jnp.bfloat16)
        st, pd = strides, padding
        if fgc == 1 and _use_im2col(kh, kw, cin):
            # shallow-cin shared-x conv (the stem): materialised patches
            # lift the MXU contraction from cin to kh*kw*cin per pass
            xb = _im2col(xb, kh, kw, st, pd)
            wc = wc.reshape(1, 1, k, s * cout)
            st, pd = (1, 1), ((0, 0), (0, 0))
        acc = lax.conv_general_dilated(
            xb, wc, st, pd,
            dimension_numbers=_DN, feature_group_count=fgc,
            preferred_element_type=jnp.float32)
        b, ho, wo = acc.shape[:3]
        if fgc > 1:
            acc = acc.reshape(b, ho, wo, s, cout)       # native 5-D view
            acc_f = acc * (x_scale * w_scale)
            out = _epilogue_5d(acc_f, b, ho, wo)
        else:
            acc_f = acc * (x_scale * w_scale)           # native 4-D view
            out = _epilogue_4d(acc_f)
    else:
        # Deep contraction: exact conv + SEPARATE one-channel-per-group
        # window-sum conv. An appended ones channel would ride the same
        # MXU pass "for free", but slicing the (cout+1)-channel output
        # breaks the conv's output fusion the same way a view change
        # does; the winsum conv contracts K x 1 instead of K x cout —
        # negligible MXU work — and enters the epilogue as a small
        # broadcast operand.
        wm = jnp.moveaxis(w8, 0, 3).reshape(kh, kw, cin, s * cout)
        xo, wo_, acct = _conv_operands(x_codes, wm, k)
        acc = lax.conv_general_dilated(
            xo, wo_, strides, padding, dimension_numbers=_DN,
            feature_group_count=fgc, preferred_element_type=acct)
        b, ho, wo = acc.shape[:3]
        n_ws = 1 if shared_x else s
        ones_k = jnp.ones((kh, kw, cin, n_ws), wo_.dtype)
        winsum = lax.conv_general_dilated(
            xo, ones_k, strides, padding, dimension_numbers=_DN,
            feature_group_count=fgc, preferred_element_type=acct)
        if fgc > 1:
            acc = acc.reshape(b, ho, wo, s, cout)       # native 5-D view
            acc_f = (acc.astype(jnp.float32)
                     - w_zp * winsum.astype(jnp.float32)[..., None]
                     ) * (x_scale * w_scale)
            out = _epilogue_5d(acc_f, b, ho, wo)
        else:
            acc_f = (acc.astype(jnp.float32)
                     - w_zp * winsum.astype(jnp.float32)
                     ) * (x_scale * w_scale)            # native 4-D view
            out = _epilogue_4d(acc_f)
    out = lax.optimization_barrier(out)
    return out.reshape(b, ho, wo, s * cout)


def int_dense_merged(x_codes, x_scale, w_codes, w_scale, w_zp, bias,
                     out_scale, out_zp, a_lo: int, a_hi: int,
                     relu: bool = False, shared_x: bool = False):
    """All-samples quantised dense in the merged layout.

    Args:
      x_codes: (B, S, F) int8 codes, or (B, F) when shared_x.
      w_codes: (S, F, O) int8 per-sample weight codes.
    Returns (B, S, O) int8 codes.
    """
    s, f, o = w_codes.shape
    w8 = w_codes.astype(jnp.int8)
    k = f
    xo, wo_, acct = _dot_operands(x_codes, w8, k)
    if shared_x:
        acc = jnp.einsum("bf,sfo->bso", xo, wo_,
                         preferred_element_type=acct)
        rowsum = jnp.sum(x_codes.astype(jnp.int32), axis=-1)[:, None, None]
    else:
        acc = jnp.einsum("bsf,sfo->bso", xo, wo_,
                         preferred_element_type=acct)
        rowsum = jnp.sum(x_codes.astype(jnp.int32), axis=-1)[..., None]
    acc_f = (acc - w_zp * rowsum).astype(jnp.float32) * (x_scale * w_scale)
    bias = jnp.zeros((o,), jnp.float32) if bias is None else bias
    return _requant_out(acc_f, bias, out_scale, out_zp, relu, a_lo, a_hi)


def int_conv(x_codes, x_scale, x_zp, w_codes, w_scale, w_zp, bias,
             out_scale, out_zp, strides, padding,
             a_lo: int, a_hi: int, relu: bool = False):
    """Quantised 2-D conv on zero-point-removed int8 codes (NHWC / HWIO):
    one MXU conv (+ a separate 1-channel winsum conv on the deep path).
    Under vmap over per-sample weights, all samples merge into one conv
    (see _conv_core)."""
    core = _conv_core(tuple(strides), tuple(tuple(p) for p in padding),
                      int(a_lo), int(a_hi), bool(relu))
    bias = jnp.zeros((w_codes.shape[-1],), jnp.float32) if bias is None \
        else bias
    return core(x_codes, jnp.asarray(x_scale, jnp.float32),
                w_codes.astype(jnp.int8),
                jnp.asarray(w_scale, jnp.float32),
                jnp.asarray(w_zp, jnp.float32), bias,
                jnp.asarray(out_scale, jnp.float32),
                jnp.asarray(out_zp, jnp.float32))
