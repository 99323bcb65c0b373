"""Fused local-reparametrisation dense forward (Pallas TPU kernel).

The Bayes-by-backprop training forward computes TWO matmuls that share the
activation tile — mean = x @ w and var = x^2 @ softplus(std)^2 — then adds
sqrt(1e-8 + var) * eps with per-activation Gaussian noise
(reference: src/models/stochastic/bbb/linear.py:30-40). This kernel keeps
the x tile in VMEM for both products and draws the noise on-chip, so the
activation is read from HBM once and no (B, N) intermediates round-trip.

XLA oracle: qbn_tpu.ops.stochastic.local_reparam_dense. An explicit-noise
variant exists for exact oracle testing (the CPU interpreter's PRNG
returns zero bits).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qbn_tpu.ops.pallas.sample_weights import _standard_normal

VAR_EPS = 1e-8


def _compute(x, w, sp, noise):
    mean = jnp.dot(x, w, preferred_element_type=jnp.float32)
    var = jnp.dot(x * x, jnp.square(sp),
                  preferred_element_type=jnp.float32)
    return mean + jnp.sqrt(VAR_EPS + var) * noise


def _kernel_prng(seed_ref, x_ref, w_ref, sp_ref, out_ref):
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + b)
    x = x_ref[:]
    noise = _standard_normal((x.shape[0], w_ref.shape[1]))
    out_ref[:] = _compute(x, w_ref[:], sp_ref[:], noise)


def _kernel_noise(x_ref, w_ref, sp_ref, noise_ref, out_ref):
    out_ref[:] = _compute(x_ref[:], w_ref[:], sp_ref[:], noise_ref[:])


def local_reparam_dense_fused(x, w, sp_std, seed, block_b: int = 128,
                              noise: Optional[jax.Array] = None,
                              interpret: bool = False):
    """out = x @ w + sqrt(1e-8 + x^2 @ sp_std^2) * eps, fused.

    Args:
      x: (B, K) f32 activations. w / sp_std: (K, N) posterior mean /
      softplus'd std. seed: int32 scalar (ignored when noise is given).
      noise: optional (B, N) explicit noise for exact testing.
    """
    bsz, k = x.shape
    n = w.shape[1]
    block_b = min(block_b, bsz)
    pad_b = (-bsz) % block_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
        if noise is not None:
            noise = jnp.pad(noise, ((0, pad_b), (0, 0)))
    grid = (x.shape[0] // block_b,)
    interp = pltpu.InterpretParams() if interpret else False
    common = dict(
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n), jnp.float32),
        interpret=interp,
    )
    if noise is not None:
        out = pl.pallas_call(
            _kernel_noise,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, k), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, n), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_b, n), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            **common,
        )(x, w, sp_std, noise.astype(jnp.float32))
        return out[:bsz]

    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)
    out = pl.pallas_call(
        _kernel_prng,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, k), lambda b, sref: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda b, sref: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda b, sref: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_b, n), lambda b, sref: (b, 0),
                                   memory_space=pltpu.VMEM),
        ),
        **common,
    )(seed_arr, x, w, sp_std)
    return out[:bsz]
