#!/usr/bin/env python
"""int_conv_merged (production op) vs the custom_vmap'd int_conv, per
ResNet stage shape, RTT-corrected. Pinpoints where the merged forward
loses time despite faster raw fgc convs (epilogue reshapes? st4's int32
grouped conv? the shared-x stem?)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tools.microbench_conv2 import measure_rtt
from qbn_tpu.ops.integer import int_conv, int_conv_merged

S, B = 20, 256
RTT = None


def timeit(name, fn, *args, flops=None, iters=100):
    @jax.jit
    def loop(x0, *rest):
        def body(i, acc):
            xi = jnp.bitwise_xor(x0, jnp.asarray(i, jnp.int8))
            out = fn(xi, *rest)
            return acc + out.astype(jnp.float32).sum()
        return lax.fori_loop(0, iters, body, jnp.zeros(()))

    try:
        np.asarray(loop(*args))
    except Exception as e:
        print(f"{name:52s} FAILED: {str(e)[:120]}", flush=True)
        return None
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    tot = time.perf_counter() - t0
    dt = (tot - RTT) / iters
    tops = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:52s} {dt * 1e3:8.3f} ms  {tops:6.1f} TOPS", flush=True)
    return dt


def main():
    global RTT
    print("devices:", jax.devices(), flush=True)
    RTT = measure_rtt()
    print(f"RTT {RTT * 1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    args = dict(x_scale=0.02, w_scale=0.005, w_zp=-5, bias=None,
                out_scale=0.03, out_zp=17)

    for tag, h, c in [("st1", 32, 24), ("st2", 16, 48), ("st3", 8, 96),
                      ("st4", 4, 192)]:
        xm = jax.random.randint(key, (B, h, h, S * c), -100, 100, jnp.int8)
        xs = jax.random.randint(key, (S, B, h, h, c), -100, 100, jnp.int8)
        w = jax.random.randint(key, (S, 3, 3, c, c), -127, 127, jnp.int8)
        fl = 2 * S * B * h * h * 9 * c * c

        timeit(f"int_conv_merged {tag} ({h}x{h} c{c})",
               lambda a, ww: int_conv_merged(
                   a, args["x_scale"], ww, args["w_scale"], args["w_zp"],
                   None, args["out_scale"], args["out_zp"], (1, 1),
                   [(1, 1)] * 2, 0, 127, relu=True), xm, w, flops=fl)
        timeit(f"int_conv vmapped {tag}",
               lambda a, ww: jax.vmap(lambda x1, w1: int_conv(
                   x1, args["x_scale"], 0, w1, args["w_scale"],
                   args["w_zp"], None, args["out_scale"], args["out_zp"],
                   (1, 1), [(1, 1)] * 2, 0, 127, relu=True))(a, ww),
               xs, w, flops=fl)

    # stem: shared x
    x0 = jax.random.randint(key, (B, 32, 32, 3), -100, 100, jnp.int8)
    w0 = jax.random.randint(key, (S, 3, 3, 3, 24), -127, 127, jnp.int8)
    fl = 2 * S * B * 32 * 32 * 9 * 3 * 24
    timeit("int_conv_merged stem (shared x)",
           lambda a, ww: int_conv_merged(
               a, args["x_scale"], ww, args["w_scale"], args["w_zp"],
               None, args["out_scale"], args["out_zp"], (1, 1),
               [(1, 1)] * 2, 0, 127, relu=True, shared_x=True),
           x0, w0, flops=fl)
    timeit("int_conv vmapped stem (shared x)",
           lambda a, ww: jax.vmap(lambda w1: int_conv(
               a, args["x_scale"], 0, w1, args["w_scale"], args["w_zp"],
               None, args["out_scale"], args["out_zp"], (1, 1),
               [(1, 1)] * 2, 0, 127, relu=True))(ww), x0, w0, flops=fl)

    # downsample convs merged
    for tag, h, cin, cout in [("ds2", 32, 24, 48), ("ds3", 16, 48, 96),
                              ("ds4", 8, 96, 192)]:
        xm = jax.random.randint(key, (B, h, h, S * cin), -100, 100,
                                jnp.int8)
        w = jax.random.randint(key, (S, 3, 3, cin, cout), -127, 127,
                               jnp.int8)
        fl = 2 * S * B * (h // 2) ** 2 * 9 * cin * cout
        timeit(f"int_conv_merged {tag} stride2",
               lambda a, ww: int_conv_merged(
                   a, args["x_scale"], ww, args["w_scale"], args["w_zp"],
                   None, args["out_scale"], args["out_zp"], (2, 2),
                   [(1, 1)] * 2, 0, 127, relu=True), xm, w, flops=fl)


if __name__ == "__main__":
    main()
