#!/usr/bin/env python
"""Cost of the bulk posterior weight draw (draw_sampled_weights).

The headline bench draws all N=100 samples' int8 weight codes up front
(one fused Pallas PRNG kernel per stochastic layer) then scans 5 chunks
of 20. Stage decomposition (tools/microbench_stages.py) accounts for
5 x 11.55 ms of compute out of ~70 ms end-to-end — this measures
whether the remaining ~12 ms is the draw, and how it splits between
N=100-up-front vs per-chunk draws.
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
from qbn_tpu.evaluation.mc import draw_sampled_weights, presample_plan

B = 256
ITERS = 8


def main():
    print("devices:", jax.devices(), flush=True)
    cfg, model, variables, _ = _flagship_int8(B, 20, weight_scale=30.0,
                                              std_value=-4.0)
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

    # variants: (QBN_DRAW_ONE, QBN_DRAW_FLAT) — flags are read at trace
    # time inside draw_sampled_weights, so one process A/Bs all three
    # QBN_DRAW_ICDF defaults ON since round 4 — every arm pins it
    # explicitly so the arm labels stay true to what runs
    variants = [("per-layer", {"QBN_DRAW_ICDF": "off"}),
                ("flat", {"QBN_DRAW_FLAT": "on", "QBN_DRAW_ICDF": "off"}),
                ("fused-one", {"QBN_DRAW_ONE": "on",
                               "QBN_DRAW_ICDF": "off"}),
                ("flat+icdf", {"QBN_DRAW_FLAT": "on",
                               "QBN_DRAW_ICDF": "on"}),
                ("per-layer+icdf", {"QBN_DRAW_FLAT": "off",
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

            key = jax.random.PRNGKey(5)
            np.asarray(loop(variables, key))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(loop(variables, jax.random.fold_in(key, 9)))
                ts.append(time.perf_counter() - t0)
            ms = (min(ts) - rtt) / ITERS * 1e3
            drawn = draw_sampled_weights(variables, plan, key, n)
            leaves = jax.tree.leaves(drawn)
            nb = sum(int(np.prod(l.shape)) for l in leaves)
            # PRNG sanity: per-position std over the sample axis must be
            # driven by the posterior std (nonzero, stable across halves)
            big = max(leaves, key=lambda l: l.size)
            a = np.asarray(big, np.float32)
            sd_all = a.std(axis=0).mean()
            sd_even = a[0::2].std(axis=0).mean()
            sd_odd = a[1::2].std(axis=0).mean()
            print(f"{vname:9s} draw N={n:4d}  {ms:7.2f} ms   "
                  f"({nb/1e6:.1f} MB codes)  "
                  f"code-std all/even/odd {sd_all:.3f}/{sd_even:.3f}/"
                  f"{sd_odd:.3f}", flush=True)


if __name__ == "__main__":
    main()


def chunked_variant():
    """Reproduce the bench's consumption pattern: draw all N, reshape to
    (chunks, chunk, ...), lax.scan over chunks, reduce each slice —
    isolates whether the paired kernel's slowdown is layout propagation
    into the scan slices."""
    cfg, model, variables, _ = _flagship_int8(B, 20, weight_scale=30.0,
                                              std_value=-4.0)
    plan = presample_plan(variables)

    @jax.jit
    def loop(v, key):
        def body(i, acc):
            s = draw_sampled_weights(v, plan, jax.random.fold_in(key, i),
                                     100)
            s = jax.tree.map(
                lambda l: l.reshape((5, 20) + l.shape[1:]), s)

            def sbody(carry, st):
                probe = sum(l.astype(jnp.float32)[(0,) * (l.ndim - 1)][0]
                            for l in jax.tree.leaves(st))
                return carry + probe, 0.0
            tot, _ = jax.lax.scan(sbody, jnp.zeros(()), s)
            return acc + tot
        return lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    key = jax.random.PRNGKey(5)
    import time as _t
    np.asarray(loop(variables, key))
    t0 = _t.perf_counter()
    np.asarray(loop(variables, jax.random.fold_in(key, 9)))
    dt = _t.perf_counter() - t0
    print(f"chunked draw+scan N=100: {dt/ITERS*1e3:7.2f} ms", flush=True)


if os.environ.get("QBN_DRAW_CHUNKED"):
    chunked_variant()
