#!/usr/bin/env python
"""W-fold grouped-conv formulation study.

XLA's TPU conv lowering contracts ~cin lanes per MXU pass, so the
feature-grouped merged MC convs (per-group cin=24/48) run at
cin/128-bound occupancy (42 useful-TOPS at stage-1 shapes of a 394
peak). Folding the kw window taps into the channel axis —
x5 = (B,H,W,S,cin) -> concat 3 W-shifted copies on the last axis ->
(B,H,W',S*3cin), kernel (3,3,cin,N) -> (3,1,3*cin,N) — triples the
per-pass contraction for a 3x activation-traffic cost (patch
materialisation), while preserving the group-major channel order the
fgc=S conv needs. Integer-valued operands keep the result exact.

Epilogues follow the production fusion contract (ops/integer.py): requant
in the conv's NATIVE 5-D output view + optimization_barrier before the
flatten, so the f32 accumulator never materialises.
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

_DN = ("NHWC", "HWIO", "NHWC")
B, S = 256, 20
RTT = None


def timeit(name, fn, x, flops=None, iters=50):
    @jax.jit
    def loop(x0):
        def body(i, acc):
            xi = jnp.bitwise_xor(x0, jnp.asarray(i, jnp.int8))
            out = fn(xi)
            return acc + out.astype(jnp.float32)[0, 0, 0, :2].sum()
        return lax.fori_loop(0, iters, body, jnp.zeros(()))

    np.asarray(loop(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(x))
        ts.append(time.perf_counter() - t0)
    dt = (min(ts) - RTT) / iters
    tops = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:24s} {dt * 1e3:8.3f} ms  {tops:6.1f} TOPS", flush=True)
    return dt


def wfold_x(x, s, cin, pad=1):
    """int8 (B,H,W,S*cin) -> (B,H,W',S*3cin), kw taps tap-major per group."""
    b, h, w, _ = x.shape
    x5 = x.reshape(b, h, w, s, cin)
    x5 = jnp.pad(x5, ((0, 0), (0, 0), (pad, pad), (0, 0), (0, 0)))
    wp = w + 2 * pad
    cols = [x5[:, :, dw:wp - 2 + dw] for dw in range(3)]
    xf = jnp.concatenate(cols, axis=-1)          # (B,H,W',S,3cin)
    return xf.reshape(b, h, w, s * 3 * cin)


def _epi(acc, s, cout):
    b, ho, wo = acc.shape[:3]
    acc5 = acc.reshape(b, ho, wo, s, cout)
    q = jnp.clip(jnp.round(acc5 * 0.0007), -127, 127).astype(jnp.int8)
    q = lax.optimization_barrier(q)
    return q.reshape(b, ho, wo, s * cout)


def main():
    global RTT
    print("devices:", jax.devices(), flush=True)
    RTT = measure_rtt()
    print(f"RTT {RTT * 1e3:.1f} ms", flush=True)

    rng = np.random.RandomState(0)
    for name, hw, cin, cout in (("st1", 32, 24, 24), ("st2", 16, 48, 48),
                                ("st3", 8, 96, 96), ("st4", 4, 192, 192)):
        x = jnp.asarray(rng.randint(-100, 101, (B, hw, hw, S * cin))
                        .astype(np.int8))
        w = jnp.asarray(rng.randint(-127, 128, (3, 3, cin, S * cout))
                        .astype(np.int8))
        wb = w.astype(jnp.bfloat16)
        wf = wb.reshape(3, 3 * cin, S * cout)[:, None]   # (3,1,3cin,N)

        def base(xi, wb=wb, cout=cout):
            acc = lax.conv_general_dilated(
                xi.astype(jnp.bfloat16), wb, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=_DN, feature_group_count=S,
                preferred_element_type=jnp.float32)
            return _epi(acc, S, cout)

        def fold(xi, wf=wf, cin=cin, cout=cout):
            xf = wfold_x(xi, S, cin)
            acc = lax.conv_general_dilated(
                xf.astype(jnp.bfloat16), wf, (1, 1), ((1, 1), (0, 0)),
                dimension_numbers=_DN, feature_group_count=S,
                preferred_element_type=jnp.float32)
            return _epi(acc, S, cout)

        a = np.asarray(base(x))
        b_ = np.asarray(fold(x))
        assert np.array_equal(a, b_), f"{name}: mismatch"

        fl = 2 * 9 * cin * cout * hw * hw * B * S
        timeit(f"{name} base", base, x, flops=fl)
        timeit(f"{name} fold", fold, x, flops=fl)


if __name__ == "__main__":
    main()
