#!/usr/bin/env python
"""Isolate where the MC-Dropout INT eval time goes (VERDICT r4 item 5).

bench_suite measures resnet_mcdropout_int8_mc at ~177 ms/batch (S=100,
B=256) vs bbb 63 ms — yet tools/probe_mcd_path.py proves the
shared-weight/batched-activation custom_vmap rule fires (every conv runs
ONE folded (S*B)-batch full-width pass), so conv formulation is not the
gap. This bench times one 20-sample chunk under controlled variants:

  full      — the production int chunk, p=0.15 (expect ~35 ms)
  nodrop    — same model built with p=0.0: dropout layers are identity;
              isolates the ENTIRE dropout cost (mask RNG + the
              dequant*mask->requant elementwise pass + any fusion damage
              around the optimization_barrier/reshape seams)
  pointwise — deterministic ResNet, same weights recipe, batch folded to
              S*B=5120 in ONE call: the pure conv+winsum floor for the
              exact same MXU work
  masksonly — just the per-layer mask draws (bernoulli on (S,B,1,1,C)
              for every dropout site): RNG cost alone

Chained fori_loop timing with per-iteration input perturbation
(CLAUDE.md relay rules). Prints one JSON line per variant.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tools.bench_suite import build_int8, measure_rtt, timed_loop
from qbn_tpu.evaluation.mc import mc_predict

S = int(os.environ.get("QBN_MCD_S", 20))
B = int(os.environ.get("QBN_MCD_B", 256))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)

    recs = {}

    def cell(name, fn, cell_args):
        dt = timed_loop(fn, cell_args, args.iters, rtt)
        recs[name] = dt
        print(json.dumps({"cell": name, "ms": round(dt * 1e3, 3)}),
              flush=True)

    # full mcdropout chunk
    _, model, variables, x = build_int8("conv_resnet_mc", "cifar", B, S,
                                        p=0.15)

    def full(variables, x, key):
        outs = mc_predict(model, variables, x, key, samples=S, mode="int")
        return jnp.sum(outs)

    cell("mcd_full_chunk20", full, (variables, x))

    # identical model, p=0 (dropout sites are identity). NOTE: with p=0
    # nothing depends on the per-sample keys, so a shared-x vmap would
    # collapse to ONE forward — feed per-sample perturbed inputs instead
    # to keep every conv at the same folded (S*B) batch as the full cell.
    from qbn_tpu.evaluation.mc import _one_sample
    _, model0, variables0, _ = build_int8("conv_resnet_mc", "cifar", B, S,
                                          p=0.0)

    def nodrop(variables, x, key):
        xs = x[None] + jnp.float32(1e-6) * jnp.arange(
            S, dtype=jnp.float32)[:, None, None, None, None]
        outs = jax.vmap(
            lambda xi, k: _one_sample(model0, "int", variables, xi, k)
        )(xs, jax.random.split(key, S))
        return jnp.sum(outs)

    cell("mcd_p0_batched_chunk20", nodrop, (variables0, x))

    # pure conv floor: pointwise forward on the folded (S*B) batch
    _, modelp, variablesp, xp = build_int8("conv_resnet", "cifar", B, 1)
    xbig = jnp.tile(xp, (S, 1, 1, 1))

    def pointwise(variables, x, key):
        outs = mc_predict(modelp, variables, x, key, samples=1,
                          mode="int")
        return jnp.sum(outs)

    cell("pointwise_b5120", pointwise, (variablesp, xbig))

    # mask RNG alone: one bernoulli per dropout site per sample
    sites = [24] * 4 + [48] * 4 + [96] * 4 + [192] * 4  # block convs

    def masks(x, key):
        tot = jnp.zeros(())
        for i, c in enumerate(sites):
            m = jax.random.bernoulli(jax.random.fold_in(key, i), 0.85,
                                     (S, B, 1, 1, c))
            tot = tot + jnp.sum(m) + jnp.sum(x[0, 0, 0])
        return tot

    cell("masks_only", masks, (x,))

    full_ms = recs["mcd_full_chunk20"] * 1e3
    p0 = recs["mcd_p0_batched_chunk20"] * 1e3
    pw = recs["pointwise_b5120"] * 1e3
    print(json.dumps({
        "summary": {
            "dropout_cost_ms": round(full_ms - p0, 3),
            "structure_overhead_ms": round(p0 - pw, 3),
            "conv_floor_ms": round(pw, 3),
            "mask_rng_ms": round(recs["masks_only"] * 1e3, 3),
        }}), flush=True)


if __name__ == "__main__":
    main()
