#!/usr/bin/env python
"""What does this TPU actually deliver? Peak-FLOPs and overhead probes.

Measures (a) the per-fori_loop-iteration fixed overhead with a trivial
body, (b) XLA bf16/int8 matmul TOPS at growing sizes, (c) the big-conv
ceiling. Calibrates every other benchmark's interpretation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(name, fn, *args, flops=None, iters=50):
    @jax.jit
    def loop(x0, *rest):
        def body(i, acc):
            xi = jnp.bitwise_xor(x0, jnp.asarray(i, x0.dtype)) \
                if x0.dtype in (jnp.int8, jnp.int32) else x0 + i
            out = fn(xi, *rest)
            probe = out[(0,) * (out.ndim - 1)][:2]
            return acc + probe.astype(jnp.float32).sum()
        return lax.fori_loop(0, iters, body, jnp.zeros(()))

    np.asarray(loop(*args))
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    tops = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:44s} {dt * 1e3:8.3f} ms  {tops:6.1f} TOPS", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    # (a) per-iteration floor: trivial body
    tiny = jnp.ones((8, 128), jnp.float32)
    timeit("fori_loop floor (tiny add)", lambda x: x * 1.0001, tiny,
           iters=200)

    # (b) matmul scaling
    for mkn in [2048, 4096, 8192, 16384]:
        m = k = n = mkn
        fl = 2 * m * k * n
        x = jax.random.normal(key, (m, k), jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(key, (k, n), jnp.float32).astype(jnp.bfloat16)
        it = max(4, min(50, int(3e12 / fl)))
        timeit(f"xla bf16 matmul {mkn}^3", lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            x, w, flops=fl, iters=it)
        xi = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        wi = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
        timeit(f"xla int8 matmul {mkn}^3", lambda a, b: lax.dot(
            a, b, preferred_element_type=jnp.int32)[:, :8].astype(
                jnp.bfloat16),
            xi, wi, flops=fl, iters=it)

    # (c) big conv ceiling: batch 4096, 32x32x128 -> 128, 3x3
    b, h, wd, c = 2048, 32, 32, 128
    x = jax.random.normal(key, (b, h, wd, c), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, c, c), jnp.float32).astype(jnp.bfloat16)
    fl = 2 * b * h * wd * 9 * c * c
    timeit("xla bf16 conv 2048x32x32x128->128", lambda a, bb: lax.conv_general_dilated(
        a, bb, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        x, w, flops=fl, iters=20)


if __name__ == "__main__":
    main()
