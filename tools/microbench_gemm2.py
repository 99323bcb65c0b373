#!/usr/bin/env python
"""Pallas GEMM probe v2: isolate why v1 measured only 7-14 TOPS.

Hypotheses tested:
  H1 per-pallas_call overhead dominates  -> one call with an internal
     M-loop should be much faster per FLOP than many grid cells.
  H2 Mosaic pipelining needs dimension_semantics=parallel.
  H3 small per-cell work starves the MXU -> scale per-cell FLOPs.
Then the realistic bconv cell: x block (1, E, E, Bb, c) int8 with taps as
leading-dim slices, accumulating 4 dots per output row.
"""

import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 50


def timeit(name, fn, *args, flops=None, iters=ITERS):
    @jax.jit
    def loop(x0, *rest):
        def body(i, acc):
            xi = jnp.bitwise_xor(x0, jnp.asarray(i, x0.dtype)) \
                if x0.dtype in (jnp.int8, jnp.int32) else x0 + i
            out = fn(xi, *rest)
            probe = out[(0,) * (out.ndim - 1)][:2]
            return acc + probe.astype(jnp.float32).sum()
        return lax.fori_loop(0, iters, body, jnp.zeros(()))

    try:
        np.asarray(loop(*args))
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:400]
        print(f"{name:44s} FAILED: {type(e).__name__}: {msg}", flush=True)
        return None
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    tops = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:44s} {dt * 1e3:8.3f} ms  {tops:6.1f} TOPS", flush=True)
    return dt


def make_gemm(m, k, n, bm, bn, semantics=None, unroll_k=False):
    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics)

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
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            **params,
        )(x, w)
    return run


def make_inner_loop_gemm(m, k, n, bm):
    """One grid cell; kernel loops over M blocks internally."""
    nb = m // bm

    def kern(x_ref, w_ref, o_ref):
        for i in range(nb):
            o_ref[pl.ds(i * bm, bm), :] = jnp.dot(
                x_ref[pl.ds(i * bm, bm), :], w_ref[:],
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def run(x, w):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        )(x, w)
    return run


def make_bconv_cell(s, nb, e, bb, c, cout, phase=0):
    """Realistic bconv kernel: x (S, E, E, B, c) int8, w (S, 4, c, n) int8,
    out (S, E, E, B, 4cout) int8. Taps are leading-dim slices; per output
    row, 4 accumulating dots of (n_out*bb, c) x (c, n)."""
    n = 4 * cout + 4
    n_out = e - 1 - phase

    def kern(x_ref, w_ref, o_ref):
        w = [w_ref[0, t].astype(jnp.bfloat16) for t in range(4)]
        for oh in range(n_out):
            acc = jnp.zeros((n_out * bb, n), jnp.float32)
            for dh in range(2):
                for dw in range(2):
                    xt = x_ref[0, oh + dh, dw:dw + n_out]   # (n_out, bb, c)
                    xm = xt.reshape(n_out * bb, c).astype(jnp.bfloat16)
                    acc += jnp.dot(xm, w[2 * dh + dw],
                                   preferred_element_type=jnp.float32)
            expand = (jax.lax.broadcasted_iota(
                jnp.int32, (4, 4 * cout), 1) // cout
                == jax.lax.broadcasted_iota(
                    jnp.int32, (4, 4 * cout), 0)).astype(jnp.float32)
            win = jnp.dot(acc[:, 4 * cout:], expand,
                          preferred_element_type=jnp.float32)
            y = (acc[:, :4 * cout] - 5.0 * win) * 1e-4
            q = jnp.clip(jnp.round(y) + 17., 0., 127.)
            o_ref[0, oh + phase, phase:phase + n_out] = (
                q.astype(jnp.int8).reshape(n_out, bb, 4 * cout))
        # zero boundary rows/cols
        o_ref[0, e - 1] = jnp.zeros((e, bb, 4 * cout), jnp.int8)
        if phase:
            o_ref[0, 0] = jnp.zeros((e, bb, 4 * cout), jnp.int8)

    def run(x, w):
        return pl.pallas_call(
            kern,
            grid=(s, nb),
            in_specs=[
                pl.BlockSpec((1, e, e, bb, c), lambda i, j: (i, 0, 0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4, c, n), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, e, e, bb, 4 * cout),
                                   lambda i, j: (i, 0, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s, e, e, nb * bb, 4 * cout),
                                           jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(x, w)
    return run


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    m, k, n = 8192, 512, 512
    fl = 2 * m * k * n
    xb = jax.random.normal(key, (m, k), jnp.float32).astype(jnp.bfloat16)
    wb = jax.random.normal(key, (k, n), jnp.float32).astype(jnp.bfloat16)

    timeit("xla bf16 dot 8192x512x512 (reference)",
           lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16), xb, wb, flops=fl)
    timeit("pallas gemm bm=512 (v1 shape)",
           make_gemm(m, k, n, 512, 512), xb, wb, flops=fl)
    timeit("pallas gemm bm=512 parallel-sem",
           make_gemm(m, k, n, 512, 512,
                     semantics=("parallel", "parallel")), xb, wb, flops=fl)
    timeit("pallas gemm bm=1024",
           make_gemm(m, k, n, 1024, 512), xb, wb, flops=fl)
    timeit("pallas gemm bm=2048",
           make_gemm(m, k, n, 2048, 512), xb, wb, flops=fl)
    timeit("pallas gemm single-cell inner loop",
           make_inner_loop_gemm(m, k, n, 512), xb, wb, flops=fl)

    # realistic bconv stage shapes (S=20, B=256)
    for tag, e, bb, cin, cout in [("st1", 18, 64, 24, 24),
                                  ("st2", 10, 128, 48, 48),
                                  ("st3", 6, 256, 96, 96)]:
        s = 20
        nb = 256 // bb
        c = 4 * cin
        h = (e - 2) * 2
        x = jax.random.randint(key, (s, e, e, nb * bb, c), -100, 100,
                               jnp.int8)
        w = jax.random.randint(key, (s, 4, c, 4 * cout + 4), -127, 127,
                               jnp.int8)
        # useful conv flops (the true 3x3 conv work this replaces)
        fl = 2 * s * 256 * h * h * 9 * cin * cout
        for phase in (0, 1):
            timeit(f"bconv {tag} phase{phase} ({h}x{h} cin={cin})",
                   make_bconv_cell(s, nb, e, bb, c, cout, phase), x, w,
                   flops=fl)


if __name__ == "__main__":
    main()
