#!/usr/bin/env python
"""Requant epilogue formulation study: VPU ops per element.

The block-tail study (microbench_resadd.py) shows every INT elementwise
pass costs ~12 ps/element — ~46 VPU ops at v5e's ~3.9 T f32 ops/s — so
the requant chain (round(y/s)+zp, 3 clips, casts) dominates shallow conv
stages and residual adds. Candidates (all over one (256,32,32,480) f32):

  cur      _requant_out as shipped: div, jnp.round, clip(0,255),
           [relu max], clip(alo,ahi), sub zp, int8 cast
  recip    division -> multiply by precomputed reciprocal
  magic    jnp.round -> (x + 2^23) - 2^23  (exact RN-even for |x|<2^22;
           values beyond clip to the same saturated code either way)
  fold     single fused clip: u = clip(round(y*r), lo-zp, hi-zp), scalar
           bounds precomputed (zp-add and zp-sub cancel)
  all      recip + magic + fold
  floor    pure read/cast/write (traffic floor)
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

RTT = None
# 1.5 * 2^23: keeps x + MAGIC inside the [2^23, 2^24) binade for
# |x| <= 2^22, where the f32 ulp is exactly 1 — so the add/sub pair is
# round-to-nearest-even to an integer for positive AND negative x.
MAGIC = jnp.float32(3 << 22)


def timeit(name, fn, *args, iters=100, nel=None):
    @jax.jit
    def loop(x0, *rest):
        def body(i, acc):
            xi = x0 + jnp.asarray(i, jnp.float32)
            out = fn(xi, *rest)
            return acc + out.astype(jnp.float32).sum()
        return lax.fori_loop(0, iters, body, jnp.zeros(()))

    np.asarray(loop(*args))
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    dt = (time.perf_counter() - t0 - RTT) / iters
    ps = dt / nel * 1e12
    print(f"{name:44s} {dt * 1e3:8.3f} ms  {ps:6.1f} ps/el", flush=True)
    return dt


def cur(y, s, zp, alo, ahi, relu):
    q = jnp.round(y / s) + zp
    q = jnp.clip(q, 0, 255)
    if relu:
        q = jnp.maximum(q, zp)
    q = jnp.clip(q, alo, ahi)
    return (q - zp).astype(jnp.int8)


def recip(y, s, zp, alo, ahi, relu):
    r = 1.0 / s
    q = jnp.round(y * r) + zp
    q = jnp.clip(q, 0, 255)
    if relu:
        q = jnp.maximum(q, zp)
    q = jnp.clip(q, alo, ahi)
    return (q - zp).astype(jnp.int8)


def magic(y, s, zp, alo, ahi, relu):
    q = ((y / s + MAGIC) - MAGIC) + zp
    q = jnp.clip(q, 0, 255)
    if relu:
        q = jnp.maximum(q, zp)
    q = jnp.clip(q, alo, ahi)
    return (q - zp).astype(jnp.int8)


def fold(y, s, zp, alo, ahi, relu):
    lo = jnp.maximum(jnp.float32(alo), zp) if relu else jnp.float32(alo)
    u = jnp.clip(jnp.round(y / s), lo - zp, ahi - zp)
    return u.astype(jnp.int8)


def all_(y, s, zp, alo, ahi, relu):
    r = 1.0 / s
    lo = jnp.maximum(jnp.float32(alo), zp) if relu else jnp.float32(alo)
    u = jnp.clip((y * r + MAGIC) - MAGIC, lo - zp, ahi - zp)
    return u.astype(jnp.int8)


def floor_(y, s, zp, alo, ahi, relu):
    return y.astype(jnp.int8)


def main():
    global RTT
    print("devices:", jax.devices(), flush=True)
    RTT = measure_rtt()
    print(f"RTT {RTT * 1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    y = jax.random.uniform(key, (256, 32, 32, 480), jnp.float32, -4.0, 8.0)
    nel = y.size
    s = jnp.float32(0.03)
    zp = jnp.float32(17)

    # exactness of the folded/magic variants vs cur on a hostile grid
    ty = jnp.concatenate([
        jnp.arange(-300, 300, 0.25, dtype=jnp.float32) * s,
        jnp.asarray([0.5, 1.5, 2.5, -0.5, -1.5], jnp.float32) * s,
        jnp.asarray([1e7, -1e7, 3e5], jnp.float32)])
    for relu in (False, True):
        ref = cur(ty, s, zp, 0, 127, relu)
        for f in (magic, fold, all_):
            got = f(ty, s, zp, 0, 127, relu)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got),
                                          err_msg=f"{f.__name__} relu={relu}")
    # NOTE: recip/all_ are exact vs *their own* semantics; vs `cur` the
    # reciprocal multiply can differ on quotient ties — count them:
    d = int((np.asarray(recip(ty, s, zp, 0, 127, False))
             != np.asarray(cur(ty, s, zp, 0, 127, False))).sum())
    print(f"recip-vs-div deltas on hostile grid: {d}/{ty.size}", flush=True)

    for relu in (False, True):
        tag = "relu" if relu else "    "
        for f in (cur, recip, magic, fold, all_, floor_):
            timeit(f"{f.__name__:8s} {tag}", lambda a: f(
                a, s, zp, 0, 127, relu), y, nel=nel)


if __name__ == "__main__":
    main()
