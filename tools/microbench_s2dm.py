#!/usr/bin/env python
"""Raw-speed check for the stage-resident space-to-depth merged conv.

Premise: stage-1 merged convs (fgc=S, cin=cout=24) run at ~19% MXU lane
occupancy. Packing 2x2 spatial blocks into channels with ALTERNATING
parity (phi: block=rows (2b,2b+1); psi: block=rows (2a-1,2a)) turns every
3x3/s1/p1 conv into a standard 2x2 block-space conv with conv-native
padding — no per-layer re-blocking:

  phi -> psi : pad ((1,1),(1,1)), input 16^2 -> output 17^2
  psi -> phi : pad ((0,0),(0,0)), input 17^2 -> output 16^2

Kernel taps scatter as u = 2A + p_in - p_out (same tensor both ways).
MACs x16/9, lanes 96/128 vs 24/128 => theoretical 2.25x. This bench
measures the RAW conv+requant cost of the packed formulation vs the
production int_conv_merged at stage-1 shapes, before any integration.
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
from qbn_tpu.ops.integer import int_conv_merged, _requant_out

S, B, C = 20, 256, 24
RTT = None
XS, WS, WZP = 0.02, 0.005, -5
OS, OZP = 0.03, 17


def scatter_s2d():
    """S2[A,B,sin(p,q),sout(p',q'),k(u*3+v)] for 3x3 kernels."""
    t = np.zeros((2, 2, 4, 4, 9), np.float32)
    for A in range(2):
        for Bb in range(2):
            for p in range(2):
                for q in range(2):
                    for pp in range(2):
                        for qq in range(2):
                            u = 2 * A + p - pp
                            v = 2 * Bb + q - qq
                            if 0 <= u <= 2 and 0 <= v <= 2:
                                t[A, Bb, p * 2 + q, pp * 2 + qq,
                                  u * 3 + v] = 1
    return t


def pack_kernel(w8, w_zp):
    """(S,3,3,cin,cout) int8 -> centered bf16 (2,2,4cin,S*4cout)."""
    s, kh, kw, cin, cout = w8.shape
    wc = w8.astype(jnp.float32) - w_zp                 # centered, exact
    w9 = jnp.moveaxis(wc.reshape(s, 9, cin, cout), 0, 2)  # (9,cin,S,cout)
    t = jnp.asarray(scatter_s2d())                     # (2,2,4,4,9)
    pk = jnp.einsum("abijk,kcso->abicjso", t, w9)
    # (2,2,4,cin,4,S,cout) -> (2,2,4*cin, S*4*cout)
    pk = pk.transpose(0, 1, 2, 3, 5, 4, 6).reshape(2, 2, 4 * cin,
                                                   s * 4 * cout)
    return pk.astype(jnp.bfloat16)


def packed_conv(xp, wpk, to_psi):
    """fgc=S 2x2 block conv, native 5-D epilogue (no border mask here —
    raw speed only)."""
    pad = ((1, 1), (1, 1)) if to_psi else ((0, 0), (0, 0))
    acc = lax.conv_general_dilated(
        xp.astype(jnp.bfloat16), wpk, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=S,
        preferred_element_type=jnp.float32)
    b, ho, wo = acc.shape[:3]
    acc = acc.reshape(b, ho, wo, S, 4 * C)
    out = _requant_out(acc * (XS * WS), jnp.zeros((4 * C,), jnp.float32),
                       OS, OZP, True, 0, 127)
    out = lax.optimization_barrier(out)
    return out.reshape(b, ho, wo, S * 4 * C)


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
        print(f"{name:46s} FAILED: {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    dt = (time.perf_counter() - t0 - RTT) / iters
    tops = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:46s} {dt * 1e3:8.3f} ms  {tops:6.1f} useful-TOPS",
          flush=True)
    return dt


def main():
    global RTT
    print("devices:", jax.devices(), flush=True)
    RTT = measure_rtt()
    print(f"RTT {RTT * 1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    w = jax.random.randint(key, (S, 3, 3, C, C), -127, 127, jnp.int8)
    wpk = pack_kernel(w, WZP)
    fl = 2 * S * B * 32 * 32 * 9 * C * C   # useful MACs (structural
    # zeros excluded) — both formulations credited identically

    # production stage-1 conv
    xm = jax.random.randint(key, (B, 32, 32, S * C), -100, 100, jnp.int8)
    timeit("int_conv_merged st1 (3x3 fgc)",
           lambda a, ww: int_conv_merged(
               a, XS, ww, WS, WZP, None, OS, OZP, (1, 1),
               [(1, 1)] * 2, 0, 127, relu=True), xm, w, flops=fl)

    # packed phi(16^2) -> psi(17^2)
    xphi = jax.random.randint(key, (B, 16, 16, S * 4 * C), -100, 100,
                              jnp.int8)
    timeit("packed phi->psi (2x2 fgc, pad 1)",
           lambda a, ww: packed_conv(a, ww, True), xphi, wpk, flops=fl)

    # packed psi(17^2) -> phi(16^2)
    xpsi = jax.random.randint(key, (B, 17, 17, S * 4 * C), -100, 100,
                              jnp.int8)
    timeit("packed psi->phi (2x2 fgc, no pad)",
           lambda a, ww: packed_conv(a, ww, False), xpsi, wpk, flops=fl)

    # the same at stage-2 width for reference
    C2 = 48
    w2 = jax.random.randint(key, (S, 3, 3, C2, C2), -127, 127, jnp.int8)
    wpk2 = pack_kernel(w2, WZP)
    fl2 = 2 * S * B * 16 * 16 * 9 * C2 * C2
    xm2 = jax.random.randint(key, (B, 16, 16, S * C2), -100, 100, jnp.int8)
    timeit("int_conv_merged st2 (3x3 fgc)",
           lambda a, ww: int_conv_merged(
               a, XS, ww, WS, WZP, None, OS, OZP, (1, 1),
               [(1, 1)] * 2, 0, 127, relu=True), xm2, w2, flops=fl2)
    xphi2 = jax.random.randint(key, (B, 8, 8, S * 4 * C2), -100, 100,
                               jnp.int8)

    def packed_conv2(xp, wpk, to_psi):
        pad = ((1, 1), (1, 1)) if to_psi else ((0, 0), (0, 0))
        acc = lax.conv_general_dilated(
            xp.astype(jnp.bfloat16), wpk, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=S, preferred_element_type=jnp.float32)
        b, ho, wo = acc.shape[:3]
        acc = acc.reshape(b, ho, wo, S, 4 * C2)
        out = _requant_out(acc * (XS * WS),
                           jnp.zeros((4 * C2,), jnp.float32),
                           OS, OZP, True, 0, 127)
        return lax.optimization_barrier(out).reshape(b, ho, wo,
                                                     S * 4 * C2)
    timeit("packed st2 phi->psi", lambda a, ww: packed_conv2(a, ww, True),
           xphi2, wpk2, flops=fl2)


if __name__ == "__main__":
    main()
