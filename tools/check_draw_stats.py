#!/usr/bin/env python
"""Distributional check of the PRNG draw kernel's math modes on real TPU.

The CPU tests (tests/test_fastmath.py) pin each mode's math against
exact quantiles on dense uniform grids, but the on-chip PRNG path
(pltpu.prng_random_bits -> uniform -> transform -> 3/127 quantise) only
runs on hardware. This draws a large field of int8 noise codes through
the REAL kernel under each mode and compares the empirical code
distribution to the exact discretised standard gaussian:

  p(code c) = Phi((c+0.5)*D) - Phi((c-0.5)*D),  D = 3/127,
  tails folded into the clamp codes +-128/127.

Reports total-variation distance and moments. Run while the TPU is idle.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qbn_tpu.ops.pallas.sample_weights import sample_weights_int8

# identity quantisation so the emitted code IS the quantised noise:
# w = 0, std code 1 at scale 1 (std_f = 1), mul grid = NOISE_SCALE
# (prod = eps_q), add grid = NOISE_SCALE with full-range clamp.
from qbn_tpu.quant.bounds import NOISE_SCALE

QP = dict(w_scale=NOISE_SCALE, w_zp=0.0, std_scale=1.0, std_zp=0.0,
          mul_scale=NOISE_SCALE, mul_zp=0.0, add_scale=NOISE_SCALE,
          add_zp=0.0)
M, N = 512, 512
SAMPLES = 64


def exact_pmf():
    d = NOISE_SCALE
    cs = np.arange(-128, 128)
    lo = (cs - 0.5) * d
    hi = (cs + 0.5) * d
    phi = lambda x: 0.5 * (1 + np.vectorize(math.erf)(x / math.sqrt(2)))
    p = phi(hi) - phi(lo)
    p[0] = phi(lo[1])            # clamp code -128 absorbs the low tail
    p[-1] = 1 - phi(lo[-1])      # clamp code 127 absorbs the high tail
    return cs, p


def main():
    print("devices:", jax.devices(), flush=True)
    w = jnp.zeros((M, N), jnp.int8)
    s = jnp.ones((M, N), jnp.int8)
    cs, pexact = exact_pmf()
    # QBN_DRAW_ICDF defaults ON since round 4 — pin it per arm
    for mode, env in (("bm-lib", {"QBN_DRAW_FAST": "off",
                                  "QBN_DRAW_ICDF": "off"}),
                      ("bm-fast", {"QBN_DRAW_ICDF": "off"}),
                      ("icdf", {"QBN_DRAW_ICDF": "on"})):
        for k in ("QBN_DRAW_FAST", "QBN_DRAW_ICDF"):
            os.environ.pop(k, None)
        os.environ.update(env)
        codes = np.asarray(jax.jit(
            lambda w, s: sample_weights_int8(w, s, QP, 1234, SAMPLES,
                                             -128, 127))(w, s))
        vals = codes.astype(np.int64).ravel()
        hist = np.bincount(vals + 128, minlength=256) / vals.size
        tv = 0.5 * np.abs(hist - pexact).sum()
        d = vals * NOISE_SCALE
        print(f"{mode:8s} n={vals.size/1e6:.1f}M TV={tv:.5f} "
              f"mean={d.mean():+.5f} std={d.std():.5f} "
              f"P(|c|=clamp)={hist[0]+hist[-1]:.5f} "
              f"(exact {pexact[0]+pexact[-1]:.5f})", flush=True)


if __name__ == "__main__":
    main()
