#!/usr/bin/env python
"""Wall-time decomposition of the production merged INT forward.

Times the flagship INT8 BBB ResNet-18 MC forward truncated after each
component (ResNet up_to kwarg) at production bench shapes (B=256,
chunk S=20), RTT-corrected chained-loop timing. Successive deltas
attribute the end-to-end 70 ms/batch (at ~365k ex-samples/s) to
stem / stages / head, steering the next optimisation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from __graft_entry__ import _flagship_int8
from qbn_tpu.evaluation.mc import (draw_sampled_weights, presample_plan,
                                   split_rngs)
from qbn_tpu.models.layers import MergedQTensor

B, S = 256, 20
ITERS = 8


def main():
    print("devices:", jax.devices(), flush=True)
    cfg, model, variables, _ = _flagship_int8(B, S, weight_scale=30.0,
                                              std_value=-4.0)
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, 32, 32, 3))
    plan = presample_plan(variables)
    sampled = draw_sampled_weights(variables, plan,
                                   jax.random.PRNGKey(1), S)

    # RTT
    @jax.jit
    def ping(v):
        return lax.fori_loop(0, 8, lambda i, a: a + (v * 1.0001)[:2].sum(),
                             jnp.zeros(()))
    np.asarray(ping(jnp.ones((128,))))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ping(jnp.ones((128,))))
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)

    points = ["stem", "stage0", "stage1", "stage2", "stage3", "pool",
              None]
    prev = 0.0
    for up_to in points:
        def fwd(v, xi, key, _up=up_to):
            out, _ = model.apply({**v, "sampled": sampled}, xi,
                                 train=False, mode="int",
                                 update_stats=False, up_to=_up,
                                 rngs=split_rngs(key), mutable=["kl"])
            if isinstance(out, MergedQTensor):
                return out.codes.astype(jnp.float32)[0, :2].sum() \
                    if out.codes.ndim == 3 else \
                    out.codes.astype(jnp.float32)[0, 0, 0, :2].sum()
            return out[0, :2].sum()

        @jax.jit
        def loop(v, xi, key):
            def body(i, acc):
                return acc + fwd(v, xi * (1.0 + 1e-6 * i),
                                 jax.random.fold_in(key, i))
            return lax.fori_loop(0, ITERS, body, jnp.zeros(()))

        key = jax.random.PRNGKey(7)
        np.asarray(loop(variables, x, key))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(variables, x, jax.random.fold_in(key, 1)))
            ts.append(time.perf_counter() - t0)
        ms = (min(ts) - rtt) / ITERS * 1e3
        name = up_to or "full"
        print(f"up_to={name:8s} {ms:8.2f} ms  (+{ms - prev:6.2f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
