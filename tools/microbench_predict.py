#!/usr/bin/env python
"""A/B the full INT8 MC predict: inline per-sample weight draws vs the
fused presampling plan, plus a weights-fixed lower bound (conv cost only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH, SAMPLES, ITERS = 256, 100, 8
CHUNK = int(os.environ.get("QBN_CHUNK", "20"))


def timed(name, fn, *args):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    sps = BATCH * SAMPLES / dt
    print(f"{name:36s} {dt * 1e3:8.1f} ms/predict  {sps:10.0f} ex-samp/s",
          flush=True)


def main():
    from __graft_entry__ import _flagship_int8
    from qbn_tpu.evaluation.mc import mc_predict, presample_plan

    cfg, model, variables, _ = _flagship_int8(
        BATCH, SAMPLES, weight_scale=30.0, std_value=-4.0)
    x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, 32, 32, 3))
    plan = presample_plan(variables)
    print("plan layers:", len(plan) if plan else 0, flush=True)

    def make(planned):
        def predict(variables, x, key):
            keys = jax.random.split(key, SAMPLES // CHUNK)

            def body(carry, k):
                outs = mc_predict(model, variables, x, k, samples=CHUNK,
                                  mode="int", plan=plan if planned else None)
                return carry + jnp.sum(outs, axis=0), 0.0

            total, _ = jax.lax.scan(body, jnp.zeros((BATCH, 10)), keys)
            return total / SAMPLES

        @jax.jit
        def loop(variables, x, key):
            def body(i, acc):
                return acc + predict(variables, x,
                                     jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((BATCH, 10)))
        return loop

    key = jax.random.PRNGKey(7)
    timed("inline per-sample weight draws", make(False), variables, x, key)
    timed("presampled plan (fused Pallas draw)", make(True), variables, x,
          key)


if __name__ == "__main__":
    main()
