#!/usr/bin/env python
"""Flagship INT MC eval: per-piece timing on the real model.

Isolates (RTT-corrected): the bulk posterior weight draw, the merged
forward with FIXED presampled weights, the vmapped forward with fixed
weights, and the inline-noise vmapped forward — so regressions in the
composed bench can be attributed.
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

BATCH, S = 256, 20
RTT = None


def timeit(name, fn, *args, iters=30, work=None):
    @jax.jit
    def loop(k0, *rest):
        def body(i, acc):
            out = fn(jax.random.fold_in(k0, i), *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.astype(jnp.float32).sum()
        return lax.fori_loop(0, iters, body, jnp.zeros(()))

    try:
        np.asarray(loop(*args))
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: "
              f"{str(e)[:150]}", flush=True)
        return None
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    tot = time.perf_counter() - t0
    dt = (tot - RTT) / iters
    sps = (work / dt) if work else 0.0
    print(f"{name:46s} {dt * 1e3:8.3f} ms  {sps / 1e3:8.1f}k ex-samp/s",
          flush=True)
    return dt


def main():
    global RTT
    print("devices:", jax.devices(), flush=True)
    RTT = measure_rtt()
    print(f"RTT {RTT * 1e3:.1f} ms", flush=True)

    from __graft_entry__ import _flagship_int8
    from qbn_tpu.evaluation.mc import (
        mc_predict, presample_plan, draw_sampled_weights, _one_sample)

    cfg, model, variables, _ = _flagship_int8(BATCH, S, weight_scale=30.0,
                                              std_value=-4.0)
    x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, 32, 32, 3),
                           jnp.float32)
    plan = presample_plan(variables)
    work = BATCH * S

    # (a) the bulk posterior draw alone
    timeit("draw_sampled_weights (S=20, full net)",
           lambda k: draw_sampled_weights(variables, plan, k, S),
           jax.random.PRNGKey(0), work=work)

    sampled = draw_sampled_weights(variables, plan, jax.random.PRNGKey(1),
                                   S)

    # (b) merged forward with fixed presampled weights
    timeit("merged forward (fixed sampled)",
           lambda k: _one_sample(model, "int",
                                 {**variables, "sampled": sampled}, x, k),
           jax.random.PRNGKey(2), work=work)

    # (c) vmapped forward with the same fixed weights
    def vmapped(k):
        keys = jax.random.split(k, S)
        return jax.vmap(lambda s_tree, kk: _one_sample(
            model, "int", {**variables, "sampled": s_tree}, x, kk)
        )(sampled, keys)
    timeit("vmapped forward (fixed sampled)", vmapped, jax.random.PRNGKey(4),
           work=work)

    # (d) inline-noise vmapped forward (the no-plan path)
    timeit("vmapped forward (inline noise)",
           lambda k: mc_predict(model, variables, x, k, samples=S,
                                mode="int", plan=None),
           jax.random.PRNGKey(5), work=work)

    # (e) composed: draw + merged (the production path)
    timeit("draw + merged (production)",
           lambda k: mc_predict(model, variables, x, k, samples=S,
                                mode="int", plan=plan, merged=True),
           jax.random.PRNGKey(6), work=work)


if __name__ == "__main__":
    main()
