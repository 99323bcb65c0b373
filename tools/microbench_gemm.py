#!/usr/bin/env python
"""Pallas GEMM calibration probe for the bconv kernel design.

Measures what the MXU actually delivers through Pallas/Mosaic at the
tile shapes the B-inner alternating-phase conv kernel would use
(M ~ 1k, K in {96, 192, 384, 768}, N = 4*cout+4), plus a large clean
GEMM as the achievable ceiling, and whether int8 x int8 -> int32 dots
lower natively on this chip (v5e has a 2x int8 MXU rate).

Run: python tools/microbench_gemm.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 50


def timeit(name, fn, *args, flops=None):
    @jax.jit
    def loop(x0, *rest):
        def body(i, acc):
            xi = jnp.bitwise_xor(x0, jnp.asarray(i, x0.dtype)) \
                if x0.dtype in (jnp.int8, jnp.int32) else x0 + i
            out = fn(xi, *rest)
            probe = out[(0,) * (out.ndim - 1)][:2]
            return acc + probe.astype(jnp.float32).sum()
        return lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    try:
        np.asarray(loop(*args))
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    dt = (time.perf_counter() - t0) / ITERS
    tops = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:46s} {dt * 1e3:8.3f} ms  {tops:6.1f} TOPS", flush=True)
    return dt


def gemm_kernel_bf16(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)


def gemm_kernel_i8(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.int32)


def make_gemm(m, k, n, bm, bn, dtype):
    kern = gemm_kernel_i8 if dtype == jnp.int8 else gemm_kernel_bf16
    out_dt = jnp.int32 if dtype == jnp.int8 else jnp.bfloat16

    def run(x, w):
        return pl.pallas_call(
            kern,
            grid=(m // bm, n // bn),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dt),
        )(x, w)
    return run


def conv_shaped_gemm(s, nb, rows, m, k, n, dtype, taps=4):
    """The bconv inner loop shape: grid (s, nb), per cell `rows` x `taps`
    accumulating dots of (m, k) x (k, n), epilogue to int8."""
    out_dt = jnp.int8

    def kern(x_ref, w_ref, o_ref):
        for r in range(rows):
            acc = jnp.zeros((m, n), jnp.float32)
            for t in range(taps):
                xt = x_ref[0, r, t] if dtype != jnp.int8 else x_ref[0, r, t]
                if dtype == jnp.int8:
                    acc += jnp.dot(xt, w_ref[0, t],
                                   preferred_element_type=jnp.int32
                                   ).astype(jnp.float32)
                else:
                    acc += jnp.dot(xt.astype(jnp.bfloat16),
                                   w_ref[0, t].astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
            q = jnp.clip(jnp.round(acc * 1e-4) + 17., 0, 127)
            o_ref[0, r] = q.astype(jnp.int8)

    def run(x, w):
        return pl.pallas_call(
            kern,
            grid=(s, nb),
            in_specs=[
                pl.BlockSpec((1, rows, taps, m, k), lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, taps, k, n), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, m, n), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s, nb * rows, m, n), jnp.int8),
        )(x, w)
    return run


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    # ceiling check: large aligned GEMM
    for (m, k, n, bm, bn) in [(8192, 512, 512, 512, 512),
                              (8192, 768, 768, 512, 768)]:
        fl = 2 * m * k * n
        xb = jax.random.normal(key, (m, k), jnp.float32).astype(jnp.bfloat16)
        wb = jax.random.normal(key, (k, n), jnp.float32).astype(jnp.bfloat16)
        timeit(f"pallas bf16 gemm {m}x{k}x{n}",
               make_gemm(m, k, n, bm, bn, jnp.bfloat16), xb, wb, flops=fl)
        xi = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        wi = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
        timeit(f"pallas int8 gemm {m}x{k}x{n}",
               make_gemm(m, k, n, bm, bn, jnp.int8), xi, wi, flops=fl)

    # conv-shaped: stage-1 bconv inner loop. S=20, B=256, 32x32, cin=24.
    # Per cell: 17 rows x 4 taps of (17*Bb, 96) x (96, 100).
    # Use padded-to-tile shapes here to see the clean-number ceiling:
    # K 96->128, N 100->128, m = 17*64 -> 1088.
    for (tag, s, nb, rows, m, k, n, dt) in [
        ("st1-pad bf16", 20, 4, 17, 1088, 128, 128, jnp.bfloat16),
        ("st1-real bf16", 20, 4, 17, 1088, 96, 104, jnp.bfloat16),
        ("st1-pad int8", 20, 4, 17, 1088, 128, 128, jnp.int8),
        ("st2-real bf16", 20, 2, 9, 1152, 192, 200, jnp.bfloat16),
        ("st3-real bf16", 20, 1, 5, 1280, 384, 392, jnp.bfloat16),
    ]:
        # flops: count useful conv work equivalent = dots as issued
        fl = s * nb * rows * 4 * 2 * m * k * n
        x = jax.random.randint(key, (s, nb * rows, 4, m, k), -100, 100,
                               jnp.int8)
        w = jax.random.randint(key, (s, 4, k, n), -127, 127, jnp.int8)
        if dt != jnp.int8:
            x, w = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
            # keep operand HBM traffic honest-ish: bf16 doubles bytes, but
            # the real kernel holds int8 in VMEM and casts tap slices.
        timeit(f"conv-shaped {tag}", conv_shaped_gemm(
            s, nb, rows, m, k, n, dt), x, w, flops=fl)


if __name__ == "__main__":
    main()
