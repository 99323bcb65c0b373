#!/usr/bin/env python
"""Merged-channel-layout (feature_group_count) conv formulation bench.

The end-to-end INT MC eval can avoid every sample-axis transpose by
keeping activations in (B, H, W, S*C) layout: the stem's merged conv
produces it, fgc=S convs preserve it, elementwise ops don't care.
This measures the full per-layer cost in that layout (conv + winsum +
requant epilogue) at every ResNet-18 stage shape, vs the current
bgc+transpose production path and the Pallas bconv kernel.

RTT-corrected timing (see microbench_conv2).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tools.microbench_conv2 import measure_rtt

S, B = 20, 256
_DN = ("NHWC", "HWIO", "NHWC")
RTT = None


def timeit(name, fn, *args, flops=None, iters=200):
    @jax.jit
    def loop(x0, *rest):
        def body(i, acc):
            xi = jnp.bitwise_xor(x0, jnp.asarray(i, jnp.int8)) \
                if x0.dtype == jnp.int8 else x0 + i
            out = fn(xi, *rest)
            # full-tensor checksum: prevents XLA from narrowing the conv
            return acc + out.astype(jnp.float32).sum()
        return lax.fori_loop(0, iters, body, jnp.zeros(()))

    try:
        np.asarray(loop(*args))
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:200]
        print(f"{name:52s} FAILED: {type(e).__name__}: {msg}", flush=True)
        return None
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    tot = time.perf_counter() - t0
    dt = (tot - RTT) / iters
    tops = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:52s} {dt * 1e3:8.3f} ms  {tops:6.1f} TOPS", flush=True)
    return dt


def fgc_layer(x, wf, wones, s, cout, relu=True, five_d=True):
    """Full fgc int layer: bf16 conv + winsum conv + requant epilogue."""
    acc = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), wf, (1, 1), [(1, 1)] * 2,
        dimension_numbers=_DN, feature_group_count=s,
        preferred_element_type=jnp.float32)
    win = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), wones, (1, 1), [(1, 1)] * 2,
        dimension_numbers=_DN, feature_group_count=s,
        preferred_element_type=jnp.float32)          # (B, H, W, S)
    b, h, w, _ = acc.shape
    if five_d:
        acc5 = acc.reshape(b, h, w, s, cout)
        y = (acc5 - 5.0 * win[..., None]) * 1e-4
        q = jnp.clip(jnp.round(y) + 17., 0., 127.)
        if relu:
            q = jnp.maximum(q, 17.)
        return (q - 17.).astype(jnp.int8).reshape(b, h, w, s * cout)
    else:
        winr = jnp.repeat(win, cout, axis=-1)
        y = (acc - 5.0 * winr) * 1e-4
        q = jnp.clip(jnp.round(y) + 17., 0., 127.)
        if relu:
            q = jnp.maximum(q, 17.)
        return (q - 17.).astype(jnp.int8)


def main():
    global RTT
    print("devices:", jax.devices(), flush=True)
    RTT = measure_rtt()
    print(f"measured fetch RTT: {RTT * 1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)

    stages = [("st1", 32, 24), ("st2", 16, 48), ("st3", 8, 96),
              ("st4", 4, 192)]
    for tag, h, c in stages:
        x = jax.random.randint(key, (B, h, h, S * c), -100, 100, jnp.int8)
        wf = jax.random.randint(key, (3, 3, c, S * c), -127, 127,
                                jnp.int8).astype(jnp.bfloat16)
        wones = jnp.ones((3, 3, c, S), jnp.bfloat16)
        fl = 2 * S * B * h * h * 9 * c * c
        timeit(f"fgc {tag} ({h}x{h} c{c}) conv-only",
               lambda a, b_, s_=S, c_=c: lax.conv_general_dilated(
                   a.astype(jnp.bfloat16), b_, (1, 1), [(1, 1)] * 2,
                   dimension_numbers=_DN, feature_group_count=s_,
                   preferred_element_type=jnp.float32).astype(jnp.int8),
               x, wf, flops=fl)
        timeit(f"fgc {tag} full layer (5d epilogue)",
               lambda a, b_, w1, s_=S, c_=c: fgc_layer(
                   a, b_, w1, s_, c_, five_d=True), x, wf, wones, flops=fl)
        timeit(f"fgc {tag} full layer (repeat epilogue)",
               lambda a, b_, w1, s_=S, c_=c: fgc_layer(
                   a, b_, w1, s_, c_, five_d=False), x, wf, wones, flops=fl)

    # downsample convs (stride 2, 3x3) + 1x1 shortcut at the 3 boundaries
    for tag, h, cin, cout in [("ds2", 32, 24, 48), ("ds3", 16, 48, 96),
                              ("ds4", 8, 96, 192)]:
        x = jax.random.randint(key, (B, h, h, S * cin), -100, 100, jnp.int8)
        wf = jax.random.randint(key, (3, 3, cin, S * cout), -127, 127,
                                jnp.int8).astype(jnp.bfloat16)
        fl = 2 * S * B * (h // 2) ** 2 * 9 * cin * cout
        timeit(f"fgc {tag} stride2 conv-only",
               lambda a, b_, s_=S: lax.conv_general_dilated(
                   a.astype(jnp.bfloat16), b_, (2, 2), [(1, 1)] * 2,
                   dimension_numbers=_DN, feature_group_count=s_,
                   preferred_element_type=jnp.float32).astype(jnp.int8),
               x, wf, flops=fl)
        w1 = jax.random.randint(key, (1, 1, cin, S * cout), -127, 127,
                                jnp.int8).astype(jnp.bfloat16)
        fl1 = 2 * S * B * (h // 2) ** 2 * cin * cout
        timeit(f"fgc {tag} 1x1 stride2 shortcut",
               lambda a, b_, s_=S: lax.conv_general_dilated(
                   a.astype(jnp.bfloat16), b_, (2, 2), "VALID",
                   dimension_numbers=_DN, feature_group_count=s_,
                   preferred_element_type=jnp.float32).astype(jnp.int8),
               x, w1, flops=fl1)

    # elementwise stage ops in merged layout: residual add requant
    for tag, h, c in stages:
        a = jax.random.randint(key, (B, h, h, S * c), -100, 100, jnp.int8)
        b_ = jax.random.randint(jax.random.fold_in(key, 1),
                                (B, h, h, S * c), -100, 100, jnp.int8)

        def addq(a, b_):
            tot = (a.astype(jnp.float32) * 0.011
                   + b_.astype(jnp.float32) * 0.017)
            q = jnp.clip(jnp.round(tot / 0.02) + 9., 0., 127.)
            return (q - 9.).astype(jnp.int8)
        timeit(f"residual add+requant {tag}", addq, a, b_)

    # the one transpose left: logits head is tiny; check stem production
    x0 = jax.random.randint(key, (B, 32, 32, 3), -100, 100, jnp.int8)
    wst = jax.random.randint(key, (3, 3, 3, S * 24), -127, 127,
                             jnp.int8).astype(jnp.bfloat16)
    fl = 2 * S * B * 32 * 32 * 9 * 3 * 24
    timeit("stem merged conv (3 -> S*24)",
           lambda a, b_: lax.conv_general_dilated(
               a.astype(jnp.bfloat16), b_, (1, 1), [(1, 1)] * 2,
               dimension_numbers=_DN,
               preferred_element_type=jnp.float32).astype(jnp.int8),
           x0, wst, flops=fl)


if __name__ == "__main__":
    main()
