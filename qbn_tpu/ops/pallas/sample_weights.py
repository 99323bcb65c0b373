"""Fused int8 posterior weight sampling (Pallas TPU kernel).

Replaces the XLA elementwise chain of the converted BBB layers' per-forward
weight draw (reference semantics: src/models/stochastic/bbb/quantized/
linear_q.py:82-94): draw fp32 Gaussian noise, quantise it at the fixed
3/127 scale, quantised-multiply with the int8 posterior std, quantised-add
to the int8 posterior mean, clamp to the sub-8-bit weight range. The
production path generates the noise on-chip (pltpu PRNG + Box-Muller) so no
HBM round trips for intermediates; an explicit-noise variant exists for
exact oracle testing (the CPU interpreter's PRNG returns zero bits).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qbn_tpu.quant.bounds import NOISE_SCALE

_TWO_PI = 6.283185307179586


def _uniform12(bits):
    """uint32 random bits -> uniform floats in [1, 2).

    Mosaic has no uint32->float32 convert, so stuff 23 random bits into a
    float mantissa with exponent 0 and bitcast.
    """
    mant = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return pltpu.bitcast(mant, jnp.float32)


def _standard_normal(shape):
    """Box-Muller standard normals from the on-chip PRNG."""
    f1 = _uniform12(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                  jnp.uint32))
    f2 = _uniform12(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                  jnp.uint32))
    u1 = 2.0 - f1          # (0, 1] — safe under log
    u2 = f2 - 1.0          # [0, 1)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _standard_normal_pair(shape):
    """BOTH Box-Muller outputs (r cos θ, r sin θ): two independent
    standard-normal fields per (log, sqrt) — the transcendentals
    dominate the draw kernel's wall time (tools/microbench_draw.py:
    157 MB of codes at 13.8 GB/s ≈ 60x below HBM speed), so pairing
    nearly halves it."""
    f1 = _uniform12(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                  jnp.uint32))
    f2 = _uniform12(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                  jnp.uint32))
    u1 = 2.0 - f1
    u2 = f2 - 1.0
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    t = _TWO_PI * u2
    return r * jnp.cos(t), r * jnp.sin(t)


# ---------------------------------------------------------------------------
# Fast-math Box-Muller: hand-rolled sincos / log polynomials.
#
# The library log/cos/sin lowerings carry full-range reduction the kernel
# does not need (θ is already in one period; u1's exponent/mantissa split
# is free via bitcast), and they dominate the draw kernel's wall time.
# Polynomial accuracy budget: the noise is immediately quantised to the
# 3/127 grid (bin width 0.0236σ), so any |Δε| ≤ ~1e-5 leaves the emitted
# int8 code unchanged except within ~4e-4 of bin edges. Max absolute
# errors measured on dense grids (tests/test_fastmath.py): sincos ~4e-6,
# -ln ~2e-6 relative.
# ---------------------------------------------------------------------------

_LN2 = 0.6931471805599453
_SQRT2 = 1.4142135623730951
_HALF_PI = 1.5707963267948966


def _fast_sincos(u):
    """(cos 2πu, sin 2πu) for u in [0, 1): quadrant reduction to
    a = π/2·d with d in [-1/2, 1/2], then odd/even Taylor polynomials
    (|err| ≤ 4e-6 at the interval ends — far below the 3/127 noise
    quantisation bin)."""
    x = 4.0 * u
    n = jnp.round(x)
    a = (x - n) * _HALF_PI                     # [-π/4, π/4]
    a2 = a * a
    cos_a = 1.0 + a2 * (-0.5 + a2 * (1.0 / 24.0 + a2 * (-1.0 / 720.0)))
    sin_a = a * (1.0 + a2 * (-1.0 / 6.0 + a2 * (1.0 / 120.0
                                                + a2 * (-1.0 / 5040.0))))
    ni = n.astype(jnp.int32)
    swap = (ni & 1) == 1
    # cos(π/2·n + a): n%4 -> {cos, -sin, -cos, sin};  sign flips when
    # (n+1)&2;  sin(π/2·n + a): n%4 -> {sin, cos, -sin, -cos}; sign when n&2
    c_mag = jnp.where(swap, sin_a, cos_a)
    s_mag = jnp.where(swap, cos_a, sin_a)
    c = jnp.where(((ni + 1) & 2) == 2, -c_mag, c_mag)
    s = jnp.where((ni & 2) == 2, -s_mag, s_mag)
    return c, s


def _fast_neg_log(u, bitcast):
    """-ln(u) for positive normal f32 u (here u in (0, 1]): exponent via
    bitcast, mantissa via the atanh series on t = (m-1)/(m+1) after
    folding m into [√2/2, √2] (|t| ≤ 0.1716; series error ~4e-9)."""
    bits = bitcast(u, jnp.uint32)
    e = (bits >> jnp.uint32(23)).astype(jnp.int32) - 127
    m = bitcast((bits & jnp.uint32(0x7FFFFF)) | jnp.uint32(0x3F800000),
                jnp.float32)                   # [1, 2)
    big = m > _SQRT2
    m = jnp.where(big, 0.5 * m, m)
    ef = (e + big.astype(jnp.int32)).astype(jnp.float32)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    ln_m = 2.0 * t * (1.0 + t2 * (1.0 / 3.0 + t2 * (1.0 / 5.0
                                                    + t2 * (1.0 / 7.0))))
    return -(ef * _LN2 + ln_m)


# ---------------------------------------------------------------------------
# Inverse-CDF draw (QBN_DRAW_ICDF): ONE normal per uniform, no sqrt and no
# sincos — x = t·p(w) with t = 2u−1 and w = −ln(1−t²) (Giles-style erfinv
# transform; 1−t² computed as (1−t)(1+t), exact near |t|→1 by Sterbenz).
#
# Accuracy budget is set by the 3/127 noise grid (§ module docstring): the
# emitted code changes only when |Δx| crosses a bin edge, and the codes
# clamp at ±128·3/127 ≈ ±3.02σ, so p(w) only needs the core |x| ≤ 3.05
# accurate and the w > 5.4 tail ≥ 3.05. A degree-6 fit on w ∈ [0, 16]
# gives max core |Δx| 4.5e-4 (1/26 bin); the log itself tolerates ~1e-2
# absolute error (dx/dw ≤ 0.7), so the mantissa uses a plain degree-4
# ln(1+z) polynomial — no atanh fold, no divide. Validated end-to-end on
# the f32 pipeline vs scipy.special.ndtri: 0.33% of draws shift by
# exactly one code (bin-edge draws), quantised-draw std matches to 4
# decimals (tests/test_fastmath.py::test_fast_ndtri*).
# ---------------------------------------------------------------------------

# np.polyfit(w, ndtri(u)/t, 6) on w = -log1p(-t^2) ∈ [0, 16]
_NDTRI_P = (3.8635427531285984e-07, -2.2181696909391053e-05,
            4.998516805939583e-04, -5.330584717241403e-03,
            1.871923104980722e-02, 3.274856508869327e-01,
            1.253253317085791e+00)
# np.polyfit(z, log1p(z), 4) on z ∈ [0, 1]
_LN1P_P = (-0.054862281195485675, 0.21640848062706985,
           -0.4640705966769647, 0.995426624186825,
           0.00014158395336088888)


def _cheap_neg_log(v, bitcast):
    """-ln(v) for positive normal f32 v to ~9e-4 absolute: exponent via
    bitcast, mantissa via a plain degree-4 ln(1+z) polynomial (cheaper
    than _fast_neg_log's atanh form: no fold branch, no divide)."""
    bits = bitcast(v, jnp.uint32)
    e = ((bits >> jnp.uint32(23)).astype(jnp.int32) - 127).astype(
        jnp.float32)
    m = bitcast((bits & jnp.uint32(0x7FFFFF)) | jnp.uint32(0x3F800000),
                jnp.float32)                   # [1, 2)
    z = m - 1.0
    p = _LN1P_P[0]
    for k in _LN1P_P[1:]:
        p = p * z + k
    return -(e * _LN2 + p)


def _fast_ndtri(u, bitcast):
    """Φ⁻¹(u) for u in (0, 1] to ~5e-4 absolute on |x| ≤ 3.05 (the whole
    pre-clamp code range); tail (w clamped at 16, incl. u = 1 exactly,
    where v = 0 bitcasts to e = −127 → w ≈ 88 → 16) stays ≥ 3.05 so the
    emitted code still clamps to ±128."""
    t = 2.0 * u - 1.0
    v = (1.0 - t) * (1.0 + t)
    w = jnp.minimum(_cheap_neg_log(v, bitcast), 16.0)
    p = _NDTRI_P[0]
    for k in _NDTRI_P[1:]:
        p = p * w + k
    return t * p


def _standard_normal_icdf(shape):
    f = _uniform12(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                 jnp.uint32))
    return _fast_ndtri(2.0 - f, pltpu.bitcast)   # u ∈ (0, 1]


def _standard_normal_pair_icdf(shape):
    """Two independent normal fields from two uniform fields — the ICDF
    needs no pairing trick, this just matches the pair-kernel layout."""
    return _standard_normal_icdf(shape), _standard_normal_icdf(shape)


def _standard_normal_pair_fast(shape):
    """_standard_normal_pair with the fast-math sincos/log."""
    f1 = _uniform12(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                  jnp.uint32))
    f2 = _uniform12(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                  jnp.uint32))
    u1 = 2.0 - f1          # (0, 1]
    u2 = f2 - 1.0          # [0, 1)
    r = jnp.sqrt(2.0 * _fast_neg_log(u1, pltpu.bitcast))
    c, s = _fast_sincos(u2)
    return r * c, r * s


def _body_parts(w, std, q_ref):
    """Per-grid-step invariants: dequantised w/std fields and scalar
    reciprocals (scalar divisions happen once, not per output element —
    a vector divide per element is the costliest op in the chain)."""
    (w_scale, w_zp, std_scale, std_zp, mul_scale, mul_zp, add_scale,
     add_zp) = [q_ref[i] for i in range(8)]
    std_f = (std.astype(jnp.float32) - std_zp) * std_scale
    w_f = (w.astype(jnp.float32) - w_zp) * w_scale
    consts = (mul_scale, mul_zp, 1.0 / mul_scale, add_zp, 1.0 / add_scale)
    return w_f, std_f, consts


def _body_from(eps, w_f, std_f, consts, w_lo, w_hi):
    mul_scale, mul_zp, inv_mul, add_zp, inv_add = consts
    # noise quantised at the fixed 3/127 scale, zero point 0
    eps_q = jnp.clip(jnp.round(eps * (1.0 / NOISE_SCALE)), -128, 127)
    # quantised multiply: requant(deq(std) * deq(eps)) on the mul grid
    prod = jnp.clip(jnp.round(std_f * (eps_q * NOISE_SCALE) * inv_mul)
                    + mul_zp, -128, 127)
    # quantised add: requant(deq(w) + deq(prod)) on the add grid
    prod_f = (prod - mul_zp) * mul_scale
    ws = jnp.clip(jnp.round((w_f + prod_f) * inv_add) + add_zp, -128, 127)
    return jnp.clip(ws, w_lo, w_hi).astype(jnp.int8)


def _body(eps, w, std, q_ref, w_lo, w_hi):
    w_f, std_f, consts = _body_parts(w, std, q_ref)
    return _body_from(eps, w_f, std_f, consts, w_lo, w_hi)


def _pair_draw_fn(fast, icdf):
    if icdf:
        return _standard_normal_pair_icdf
    return _standard_normal_pair_fast if fast else _standard_normal_pair


def _kernel_prng(seed_ref, w_ref, std_ref, q_ref, out_ref, *, w_lo, w_hi,
                 icdf=False):
    s = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + s)
    draw = _standard_normal_icdf if icdf else _standard_normal
    eps = draw(w_ref.shape)
    out_ref[0] = _body(eps, w_ref[:], std_ref[:], q_ref, w_lo, w_hi)


def _kernel_prng_pair(seed_ref, w_ref, std_ref, q_ref, out_ref, *,
                      w_lo, w_hi, fast=False, icdf=False):
    """Two samples per grid step from one Box-Muller pair (or two
    inverse-CDF fields under QBN_DRAW_ICDF)."""
    s = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + s)
    eps_a, eps_b = _pair_draw_fn(fast, icdf)(w_ref.shape)
    w_f, std_f, consts = _body_parts(w_ref[:], std_ref[:], q_ref)
    out_ref[0] = _body_from(eps_a, w_f, std_f, consts, w_lo, w_hi)
    out_ref[1] = _body_from(eps_b, w_f, std_f, consts, w_lo, w_hi)


def _kernel_noise(w_ref, std_ref, q_ref, noise_ref, out_ref, *, w_lo, w_hi):
    out_ref[0] = _body(noise_ref[0], w_ref[:], std_ref[:], q_ref, w_lo,
                       w_hi)


def _qvec(qparams):
    return jnp.stack([
        jnp.asarray(qparams[k], jnp.float32)
        for k in ("w_scale", "w_zp", "std_scale", "std_zp", "mul_scale",
                  "mul_zp", "add_scale", "add_zp")])


def sample_weights_int8(w_codes, std_codes, qparams, seed, samples: int,
                        w_lo: int, w_hi: int,
                        noise: Optional[jax.Array] = None,
                        interpret: bool = False):
    """Draw `samples` int8 weight samples.

    Args:
      w_codes / std_codes: (M, N) int8 posterior mean / std codes.
      qparams: dict with w_scale/w_zp/std_scale/std_zp/mul_scale/mul_zp/
        add_scale/add_zp scalars.
      seed: int32 scalar seed (ignored when noise is given).
      w_lo / w_hi: sub-8-bit weight clamp bounds.
      noise: optional (samples, M, N) f32 explicit noise (testing).
    Returns (samples, M, N) int8 sampled weight codes.
    """
    m, n = w_codes.shape
    qvec = _qvec(qparams)
    interp = pltpu.InterpretParams() if interpret else False
    common = dict(
        out_shape=jax.ShapeDtypeStruct((samples, m, n), jnp.int8),
        interpret=interp,
    )
    w8 = w_codes.astype(jnp.int8)
    s8 = std_codes.astype(jnp.int8)
    if noise is not None:
        kernel = functools.partial(_kernel_noise, w_lo=w_lo, w_hi=w_hi)
        return pl.pallas_call(
            kernel,
            grid=(samples,),
            in_specs=[
                pl.BlockSpec((m, n), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, n), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, m, n), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m, n), lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            **common,
        )(w8, s8, qvec, noise.astype(jnp.float32))

    import os
    pair = samples % 2 == 0 and \
        os.environ.get("QBN_DRAW_PAIR", "on") != "off"
    # fast-math default ON: measured 9.59 -> 6.74 ms per 100 samples on
    # the real v5e (tools/microbench_draw.py, flagship ResNet plan) with
    # identical emitted-code std to 3 decimals; accuracy pinned by
    # tests/test_fastmath.py (|d-eps| < 5e-5 vs the library lowerings,
    # far below the 3/127 noise quantisation bin).
    fast = os.environ.get("QBN_DRAW_FAST", "on") != "off"
    icdf = os.environ.get("QBN_DRAW_ICDF", "on") != "off"
    if pair:
        kernel = functools.partial(_kernel_prng_pair, w_lo=w_lo,
                                   w_hi=w_hi, fast=fast, icdf=icdf)
        grid = (samples // 2,)
        out_specs = pl.BlockSpec((2, m, n), lambda s, sref: (s, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_kernel_prng, w_lo=w_lo, w_hi=w_hi,
                                   icdf=icdf)
        grid = (samples,)
        out_specs = pl.BlockSpec((1, m, n), lambda s, sref: (s, 0, 0),
                                 memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, n), lambda s, sref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, n), lambda s, sref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
    )
    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)
    return pl.pallas_call(kernel, grid_spec=grid_spec, **common)(
        seed_arr, w8, s8, qvec)


_FLAT_LANES = 512


def draw_flat(w_codes, std_codes, qparams, seed, samples: int,
              w_lo: int, w_hi: int, noise: Optional[jax.Array] = None,
              interpret: bool = False):
    """sample_weights_int8 on a lane-packed layout.

    The natural (M, cout) weight layout puts cout on the 128-lane axis, so
    the width-24/48 ResNet stages run the draw kernel at 19-37% lane fill.
    The kernel is purely elementwise, so the layout is free to choose:
    flatten to (rows, 512) — full lane tiles — then slice the pad off.

    `noise`, when given (testing), must already be (samples, rows, 512);
    use flat_rows() for the row count.
    """
    m, n = w_codes.shape
    total = m * n
    rows = -(-total // _FLAT_LANES)
    pad = rows * _FLAT_LANES - total
    wf = w_codes.reshape(-1)
    sf = std_codes.reshape(-1)
    if pad:
        wf = jnp.pad(wf, (0, pad))
        sf = jnp.pad(sf, (0, pad))
    codes = sample_weights_int8(
        wf.reshape(rows, _FLAT_LANES), sf.reshape(rows, _FLAT_LANES),
        qparams, seed, samples, w_lo, w_hi, noise=noise,
        interpret=interpret)
    codes = codes.reshape(samples, rows * _FLAT_LANES)
    if pad:
        codes = codes[:, :total]
    return codes.reshape(samples, m, n)


def flat_rows(m: int, n: int) -> int:
    return -(-(m * n) // _FLAT_LANES)


# ---------------------------------------------------------------------------
# Whole-model fused draw: ONE pallas_call for every stochastic layer.
#
# The per-layer formulation issues ~21 pallas_calls x (samples/2) grid
# steps for a ResNet-18, each step re-seeding the PRNG and processing one
# (often tiny, lane-starved) weight block. Packing every layer into one
# (R, 512) row buffer with per-ROW qparams (each layer padded to a row
# boundary so a row never spans two layers) turns the whole draw into one
# kernel with full-lane blocks.
# ---------------------------------------------------------------------------

_ROW_BLOCK = 512  # rows per grid step: (2, 512, 512) int8 out = 0.5 MB


def _body_rows(eps, w, std, q):
    """_body_from with per-row (broadcast along lanes) quantisation
    parameters. q: (rows, 16) f32 — columns 0..9 = w_scale, w_zp,
    std_scale, std_zp, mul_scale, mul_zp, add_scale, add_zp, w_lo, w_hi
    (padded to 16 lanes for layout friendliness)."""
    w_scale, w_zp = q[:, 0:1], q[:, 1:2]
    std_scale, std_zp = q[:, 2:3], q[:, 3:4]
    mul_scale, mul_zp = q[:, 4:5], q[:, 5:6]
    add_scale, add_zp = q[:, 6:7], q[:, 7:8]
    w_lo, w_hi = q[:, 8:9], q[:, 9:10]
    std_f = (std.astype(jnp.float32) - std_zp) * std_scale
    w_f = (w.astype(jnp.float32) - w_zp) * w_scale
    eps_q = jnp.clip(jnp.round(eps * (1.0 / NOISE_SCALE)), -128, 127)
    prod = jnp.clip(jnp.round(std_f * (eps_q * NOISE_SCALE)
                              * (1.0 / mul_scale)) + mul_zp, -128, 127)
    prod_f = (prod - mul_zp) * mul_scale
    ws = jnp.clip(jnp.round((w_f + prod_f) * (1.0 / add_scale)) + add_zp,
                  -128, 127)
    return jnp.clip(ws, w_lo, w_hi).astype(jnp.int8)


def _kernel_rows_prng(seed_ref, w_ref, std_ref, q_ref, out_ref, *,
                      n_row_blocks, fast, icdf=False):
    s = pl.program_id(0)
    rb = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + s * n_row_blocks + rb)
    eps_a, eps_b = _pair_draw_fn(fast, icdf)(w_ref.shape)
    q = q_ref[:, :]
    out_ref[0] = _body_rows(eps_a, w_ref[:], std_ref[:], q)
    out_ref[1] = _body_rows(eps_b, w_ref[:], std_ref[:], q)


def _kernel_rows_noise(w_ref, std_ref, q_ref, noise_ref, out_ref):
    out_ref[0] = _body_rows(noise_ref[0], w_ref[:], std_ref[:],
                            q_ref[:, :])


def pack_layers(layers):
    """Pack per-layer (w2, s2, qparams, w_lo, w_hi) into row buffers.

    Returns (w_rows, std_rows, q_rows, offsets) where offsets[i] is the
    starting row of layer i; each layer occupies flat_rows(m, n) rows.
    Row count is padded to a _ROW_BLOCK multiple (pad rows draw garbage
    that is never sliced back out).
    """
    w_parts, s_parts, q_parts, offsets = [], [], [], []
    row = 0
    for (w2, s2, qp, w_lo, w_hi) in layers:
        m, n = w2.shape
        rows = flat_rows(m, n)
        pad = rows * _FLAT_LANES - m * n
        wf = w2.reshape(-1)
        sf = s2.reshape(-1)
        if pad:
            wf = jnp.pad(wf, (0, pad))
            sf = jnp.pad(sf, (0, pad))
        w_parts.append(wf.reshape(rows, _FLAT_LANES))
        s_parts.append(sf.reshape(rows, _FLAT_LANES))
        qv = jnp.stack([jnp.asarray(qp[k], jnp.float32) for k in (
            "w_scale", "w_zp", "std_scale", "std_zp", "mul_scale",
            "mul_zp", "add_scale", "add_zp")]
            + [jnp.asarray(w_lo, jnp.float32),
               jnp.asarray(w_hi, jnp.float32)]
            + [jnp.zeros((), jnp.float32)] * 6)
        q_parts.append(jnp.broadcast_to(qv[None], (rows, 16)))
        offsets.append(row)
        row += rows
    total_rows = -(-row // _ROW_BLOCK) * _ROW_BLOCK
    if total_rows != row:
        extra = total_rows - row
        w_parts.append(jnp.zeros((extra, _FLAT_LANES), jnp.int8))
        s_parts.append(jnp.zeros((extra, _FLAT_LANES), jnp.int8))
        q_parts.append(jnp.broadcast_to(
            jnp.asarray([1.0, 0, 1, 0, 1, 0, 1, 0, -128, 127]
                        + [0.0] * 6, jnp.float32)[None], (extra, 16)))
    return (jnp.concatenate(w_parts), jnp.concatenate(s_parts),
            jnp.concatenate(q_parts), offsets)


def draw_all_layers(layers, seed, samples: int,
                    noise: Optional[jax.Array] = None,
                    interpret: bool = False):
    """Draw `samples` int8 weight samples for EVERY layer in one kernel.

    layers: list of (w_codes_2d, std_codes_2d, qparams, w_lo, w_hi).
    noise (testing): (samples, R, 512) f32 where R is the packed padded
    row count (use pack_layers to compute it).
    Returns a list of (samples, m, n) int8 code arrays, layer order.
    """
    w_rows, s_rows, q_rows, offsets = pack_layers(layers)
    r = w_rows.shape[0]
    nrb = r // _ROW_BLOCK
    interp = pltpu.InterpretParams() if interpret else False
    common = dict(
        out_shape=jax.ShapeDtypeStruct((samples, r, _FLAT_LANES),
                                       jnp.int8),
        interpret=interp,
    )
    if noise is not None:
        out = pl.pallas_call(
            _kernel_rows_noise,
            grid=(samples, nrb),
            in_specs=[
                pl.BlockSpec((_ROW_BLOCK, _FLAT_LANES),
                             lambda s, rb: (rb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROW_BLOCK, _FLAT_LANES),
                             lambda s, rb: (rb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROW_BLOCK, 16), lambda s, rb: (rb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _ROW_BLOCK, _FLAT_LANES),
                             lambda s, rb: (s, rb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, _ROW_BLOCK, _FLAT_LANES),
                                   lambda s, rb: (s, rb, 0),
                                   memory_space=pltpu.VMEM),
            **common,
        )(w_rows, s_rows, q_rows, noise.astype(jnp.float32))
    else:
        import os
        if samples % 2 != 0:
            raise ValueError("fused whole-model draw needs even samples")
        fast = os.environ.get("QBN_DRAW_FAST", "on") != "off"
        icdf = os.environ.get("QBN_DRAW_ICDF", "on") != "off"
        kernel = functools.partial(_kernel_rows_prng, n_row_blocks=nrb,
                                   fast=fast, icdf=icdf)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(samples // 2, nrb),
            in_specs=[
                pl.BlockSpec((_ROW_BLOCK, _FLAT_LANES),
                             lambda s, rb, sref: (rb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROW_BLOCK, _FLAT_LANES),
                             lambda s, rb, sref: (rb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROW_BLOCK, 16), lambda s, rb, sref: (rb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, _ROW_BLOCK, _FLAT_LANES),
                                   lambda s, rb, sref: (s, rb, 0),
                                   memory_space=pltpu.VMEM),
        )
        seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)
        out = pl.pallas_call(kernel, grid_spec=grid_spec, **common)(
            seed_arr, w_rows, s_rows, q_rows)

    flat = out.reshape(samples, r * _FLAT_LANES)
    results = []
    for (w2, _s, _q, _lo, _hi), off in zip(layers, offsets):
        m, n = w2.shape
        start = off * _FLAT_LANES
        results.append(
            jax.lax.slice_in_dim(flat, start, start + m * n, axis=1)
            .reshape(samples, m, n))
    return results


def sample_weights_oracle(w_codes, std_codes, qparams, noise, w_lo, w_hi):
    """Pure-XLA oracle for the explicit-noise variant (same arithmetic as
    the converted layers' int path, and bit-identical operation order to
    the kernel: multiply-by-reciprocal, not divide)."""
    eps_q = jnp.clip(jnp.round(noise * (1.0 / NOISE_SCALE)), -128, 127)
    std_f = (std_codes.astype(jnp.float32)
             - qparams["std_zp"]) * qparams["std_scale"]
    prod = jnp.clip(jnp.round(std_f * (eps_q * NOISE_SCALE)
                              * (1.0 / qparams["mul_scale"]))
                    + qparams["mul_zp"], -128, 127)
    w_f = (w_codes.astype(jnp.float32)
           - qparams["w_zp"]) * qparams["w_scale"]
    prod_f = (prod - qparams["mul_zp"]) * qparams["mul_scale"]
    ws = jnp.clip(jnp.round((w_f + prod_f) * (1.0 / qparams["add_scale"]))
                  + qparams["add_zp"], -128, 127)
    return jnp.clip(ws, w_lo, w_hi).astype(jnp.int8)
