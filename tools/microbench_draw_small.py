#!/usr/bin/env python
"""Small-tier (mnist LeNet) posterior-draw A/B: flat vs natural vs ICDF.

The QBN_DRAW_FLAT default was justified on the flagship ResNet-18 draw
(tools/microbench_draw.py); this spot-checks the other production tier.
The LeNet is the shape that found the scoped-VMEM hazard (fc1 rows=2393
routes through the row-blocked whole-model kernel — evaluation/mc.py
big_rows guard), so this also measures that path's cost directly.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from qbn_tpu.config import Config
from qbn_tpu.evaluation.mc import draw_sampled_weights, presample_plan
from qbn_tpu.models.factory import build_model
from qbn_tpu.utils import apply_model, convert_model, init_variables

B = 256
ITERS = 8


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    cfg = Config(model="conv_lenet_bbb", input_size=(28, 28, 1),
                 output_size=10, at=True, q=True, samples=20,
                 batch_size=B)
    model = build_model(cfg)
    x = jax.random.uniform(key, (B, 28, 28, 1), jnp.float32)
    variables = init_variables(model, key, x, quantized=True)
    _, _, variables = apply_model(model, variables, x, key, train=True,
                                  mode="qat", update_stats=True)
    _, _, variables = apply_model(model, variables, x, key, train=False,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, key)
    plan = presample_plan(variables)
    print("plan layers:", [("/".join(p), lo, hi) for p, lo, hi in plan],
          flush=True)

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

    # QBN_DRAW_ICDF defaults ON since round 4 — pin it per arm
    variants = [("flat", {"QBN_DRAW_FLAT": "on", "QBN_DRAW_ICDF": "off"}),
                ("per-layer", {"QBN_DRAW_FLAT": "off",
                               "QBN_DRAW_ICDF": "off"}),
                ("flat+icdf", {"QBN_DRAW_FLAT": "on",
                               "QBN_DRAW_ICDF": "on"}),
                ("natural+icdf", {"QBN_DRAW_FLAT": "off",
                                  "QBN_DRAW_ICDF": "on"})]
    for vname, env in variants:
        for k in ("QBN_DRAW_ONE", "QBN_DRAW_FLAT", "QBN_DRAW_ICDF"):
            os.environ.pop(k, None)
        os.environ.update(env)
        for n in (100, 20):
            def mk_loop(n=n):
                @jax.jit
                def loop(v, key):
                    def body(i, acc):
                        s = draw_sampled_weights(
                            v, plan, jax.random.fold_in(key, i), n)
                        leaves = jax.tree.leaves(s)
                        probe = sum(
                            l.astype(jnp.float32)[(0,) * (l.ndim - 1)][0]
                            for l in leaves)
                        return acc + probe
                    return lax.fori_loop(0, ITERS, body, jnp.zeros(()))
                return loop
            loop = mk_loop()
            k2 = jax.random.PRNGKey(5)
            np.asarray(loop(variables, k2))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(loop(variables, jax.random.fold_in(k2, 9)))
                ts.append(time.perf_counter() - t0)
            ms = (min(ts) - rtt) / ITERS * 1e3
            drawn = draw_sampled_weights(variables, plan, k2, n)
            leaves = jax.tree.leaves(drawn)
            nb = sum(int(np.prod(l.shape)) for l in leaves)
            big = max(leaves, key=lambda l: l.size)
            a = np.asarray(big, np.float32)
            print(f"{vname:13s} draw N={n:4d}  {ms:7.2f} ms   "
                  f"({nb/1e6:.1f} MB codes)  code-std {a.std(axis=0).mean():.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
