#!/usr/bin/env python
"""Residual block TAIL formulation study (merged INT layout), RTT-corrected.

The QBN_ABLATE_ADD measurement showed the block tail (conv2 requant ->
residual dequant/add/requant -> ReLU) costing ~23% of INT MC-eval wall
time when the add runs as a separate pass over materialised int8 codes.
This bench isolates the tail at each ResNet stage shape:

  eager   int_conv_merged (requant epilogue) + separate add + relu
  barrier eager + lax.optimization_barrier between requant and add
          (the production tail: stops XLA sinking the conv's requant
          into the add fusion, which would materialise the f32 acc)
  noadd   int_conv_merged alone (the ablation floor)
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
from qbn_tpu.ops.integer import int_conv_merged

S, B = 20, 256
RTT = None

XS, WS, WZP = 0.02, 0.005, -5
OS, OZP = 0.03, 17       # conv2 act qparams
ADD_S, ADD_Z = 0.05, 11  # residual add qparams
ALO, AHI = 0, 127


def tail_eager(x, w, res):
    codes = int_conv_merged(x, XS, w, WS, WZP, None, OS, OZP,
                            (1, 1), [(1, 1)] * 2, ALO, AHI, relu=False)
    total = codes.astype(jnp.float32) * OS + res.astype(jnp.float32) * XS
    q = jnp.clip(jnp.round(total / ADD_S) + ADD_Z, 0, 255)
    u = (jnp.clip(q, ALO, AHI) - ADD_Z).astype(jnp.int8)
    return jnp.maximum(u, jnp.int8(0))


# (A deferred-requant variant — hand the raw f32 accumulator to the add
# chain — measured WORSE than eager: the TPU conv emitter cannot host a
# fusion with a second full-size operand, so the f32 accumulator
# materialises at 4x the int8 bytes. st1 2.500 ms vs barrier 1.925 ms.)


def tail_noadd(x, w, res):
    return int_conv_merged(x, XS, w, WS, WZP, None, OS, OZP,
                           (1, 1), [(1, 1)] * 2, ALO, AHI, relu=False)


def tail_barrier(x, w, res):
    """eager + optimization_barrier between requant and add: stops XLA
    sinking the requant out of the conv epilogue into the add fusion
    (the sink forces a 4x f32 accumulator materialisation — see
    /tmp/chunk_hlo.txt: convolution_multiply_fusion emits f32)."""
    codes = int_conv_merged(x, XS, w, WS, WZP, None, OS, OZP,
                            (1, 1), [(1, 1)] * 2, ALO, AHI, relu=False)
    codes = lax.optimization_barrier(codes)
    total = codes.astype(jnp.float32) * OS + res.astype(jnp.float32) * XS
    q = jnp.clip(jnp.round(total / ADD_S) + ADD_Z, 0, 255)
    u = (jnp.clip(q, ALO, AHI) - ADD_Z).astype(jnp.int8)
    return jnp.maximum(u, jnp.int8(0))


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
        print(f"{name:40s} FAILED: {str(e)[:120]}", flush=True)
        return None
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    tot = time.perf_counter() - t0
    dt = (tot - RTT) / iters
    tops = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:40s} {dt * 1e3:8.3f} ms  {tops:6.1f} TOPS", flush=True)
    return dt


def main():
    global RTT
    print("devices:", jax.devices(), flush=True)
    RTT = measure_rtt()
    print(f"RTT {RTT * 1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)

    for tag, h, c in [("st1", 32, 24), ("st2", 16, 48), ("st3", 8, 96),
                      ("st4", 4, 192)]:
        x = jax.random.randint(key, (B, h, h, S * c), -100, 100, jnp.int8)
        res = jax.random.randint(key, (B, h, h, S * c), -100, 100,
                                 jnp.int8)
        w = jax.random.randint(key, (S, 3, 3, c, c), -127, 127, jnp.int8)
        fl = 2 * S * B * h * h * 9 * c * c
        # exactness first (tiny slice, on whatever backend this runs)
        e = tail_eager(x[:2], w, res[:2])
        f = tail_barrier(x[:2], w, res[:2])
        np.testing.assert_array_equal(np.asarray(e), np.asarray(f))
        timeit(f"eager tail {tag} ({h}x{h} c{c})", tail_eager, x, w, res,
               flops=fl)
        timeit(f"barrier tail {tag}", tail_barrier, x, w, res, flops=fl)
        timeit(f"noadd floor {tag}", tail_noadd, x, w, res, flops=fl)


if __name__ == "__main__":
    main()
