#!/usr/bin/env python
"""Headline-bench chunk-size sweep in ONE process.

The production INT MC eval scans the 100-sample axis in chunks
(bench.py QBN_BENCH_CHUNK, default 20) to bound sampled-weight HBM
residency. Larger chunks amortise per-chunk layout transitions; smaller
ones re-run them more often. This sweeps the chunk size with the relay
warmup paid once.
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
from qbn_tpu.evaluation.mc import (draw_sampled_weights, mc_predict,
                                   presample_plan)

BATCH = 256
SAMPLES = 100
ITERS = 8


def main():
    print("devices:", jax.devices(), flush=True)
    cfg, model, variables, _ = _flagship_int8(
        BATCH, SAMPLES, weight_scale=30.0, std_value=-4.0)
    x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, 32, 32, 3),
                           jnp.float32)
    plan = presample_plan(variables)

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

    for chunk in (20, 25, 50, 100):
        def predict(variables, x, key, chunk=chunk):
            k_w, key = jax.random.split(key)
            sampled = draw_sampled_weights(variables, plan, k_w, SAMPLES)
            if chunk == SAMPLES:
                outs = mc_predict(model, variables, x, key,
                                  samples=SAMPLES, mode="int", plan=plan,
                                  presampled=sampled)
                return jnp.sum(outs, axis=0) / SAMPLES
            sampled = jax.tree.map(
                lambda l: l.reshape((SAMPLES // chunk, chunk)
                                    + l.shape[1:]), sampled)
            keys = jax.random.split(key, SAMPLES // chunk)

            def body(carry, sk):
                s_tree, k = sk
                outs = mc_predict(model, variables, x, k, samples=chunk,
                                  mode="int", plan=plan,
                                  presampled=s_tree)
                return carry + jnp.sum(outs, axis=0), 0.0

            total, _ = lax.scan(body, jnp.zeros((BATCH, 10)),
                                (sampled, keys))
            return total / SAMPLES

        @jax.jit
        def loop(variables, x, key, predict=predict):
            def body(i, acc):
                return acc + predict(variables, x,
                                     jax.random.fold_in(key, i))
            return lax.fori_loop(0, ITERS, body, jnp.zeros((BATCH, 10)))

        key = jax.random.PRNGKey(7)
        np.asarray(loop(variables, x, key))
        best = float("inf")
        for rep in (1, 2):
            t0 = time.perf_counter()
            out = np.asarray(loop(variables, x,
                                  jax.random.fold_in(key, rep)))
            best = min(best, time.perf_counter() - t0)
            assert np.all(np.isfinite(out))
        per = (best - rtt) / ITERS
        print(f"chunk={chunk:3d}  {per*1e3:7.2f} ms/batch  "
              f"{BATCH*SAMPLES/per:,.0f} ex-samples/s", flush=True)


if __name__ == "__main__":
    main()
