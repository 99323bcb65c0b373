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


def _body(eps, w, std, q_ref, w_lo, w_hi):
    (w_scale, w_zp, std_scale, std_zp, mul_scale, mul_zp, add_scale,
     add_zp) = [q_ref[i] for i in range(8)]
    # noise quantised at the fixed 3/127 scale, zero point 0
    eps_q = jnp.clip(jnp.round(eps * (1.0 / NOISE_SCALE)), -128, 127)
    # quantised multiply: requant(deq(std) * deq(eps)) on the mul grid
    std_f = (std.astype(jnp.float32) - std_zp) * std_scale
    prod = jnp.clip(jnp.round(std_f * (eps_q * NOISE_SCALE) / mul_scale)
                    + mul_zp, -128, 127)
    # quantised add: requant(deq(w) + deq(prod)) on the add grid
    w_f = (w.astype(jnp.float32) - w_zp) * w_scale
    prod_f = (prod - mul_zp) * mul_scale
    ws = jnp.clip(jnp.round((w_f + prod_f) / add_scale) + add_zp, -128, 127)
    return jnp.clip(ws, w_lo, w_hi).astype(jnp.int8)


def _kernel_prng(seed_ref, w_ref, std_ref, q_ref, out_ref, *, w_lo, w_hi):
    s = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + s)
    eps = _standard_normal(w_ref.shape)
    out_ref[0] = _body(eps, w_ref[:], std_ref[:], q_ref, w_lo, w_hi)


def _kernel_prng_pair(seed_ref, w_ref, std_ref, q_ref, out_ref, *,
                      w_lo, w_hi):
    """Two samples per grid step from one Box-Muller pair."""
    s = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + s)
    eps_a, eps_b = _standard_normal_pair(w_ref.shape)
    w, std = w_ref[:], std_ref[:]
    out_ref[0] = _body(eps_a, w, std, q_ref, w_lo, w_hi)
    out_ref[1] = _body(eps_b, w, std, q_ref, w_lo, w_hi)


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
    if pair:
        kernel = functools.partial(_kernel_prng_pair, w_lo=w_lo,
                                   w_hi=w_hi)
        grid = (samples // 2,)
        out_specs = pl.BlockSpec((2, m, n), lambda s, sref: (s, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_kernel_prng, w_lo=w_lo, w_hi=w_hi)
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


def sample_weights_oracle(w_codes, std_codes, qparams, noise, w_lo, w_hi):
    """Pure-XLA oracle for the explicit-noise variant (same arithmetic as
    the converted layers' int path, and bit-identical operation order to
    the kernel: multiply-by-reciprocal, not divide)."""
    eps_q = jnp.clip(jnp.round(noise * (1.0 / NOISE_SCALE)), -128, 127)
    std_f = (std_codes.astype(jnp.float32)
             - qparams["std_zp"]) * qparams["std_scale"]
    prod = jnp.clip(jnp.round(std_f * (eps_q * NOISE_SCALE)
                              / qparams["mul_scale"]) + qparams["mul_zp"],
                    -128, 127)
    w_f = (w_codes.astype(jnp.float32)
           - qparams["w_zp"]) * qparams["w_scale"]
    prod_f = (prod - qparams["mul_zp"]) * qparams["mul_scale"]
    ws = jnp.clip(jnp.round((w_f + prod_f) / qparams["add_scale"])
                  + qparams["add_zp"], -128, 127)
    return jnp.clip(ws, w_lo, w_hi).astype(jnp.int8)
