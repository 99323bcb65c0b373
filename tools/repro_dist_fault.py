#!/usr/bin/env python
"""Minimal repro probe for the mcdropout monolithic distortion-program
TPU worker fault (VERDICT r4 item 3).

History: the mcdropout-cifar float leg killed the TPU worker twice
("UNAVAILABLE ... kernel fault"), both times inside the MONOLITHIC
15-cell device-resident distortion program (mc._sweep_scan), while the
same-shape clean-test/OOD scan programs and the pointwise/bbb sweeps on
the SAME program shape ran fine. QBN_DIST_SPLIT=on (one small program
per cell) is the bitwise-tested fallback. This probe reconstructs the
monolithic program at campaign fidelity — float mcdropout ResNet-18
w24, S=20 vmapped forwards with per-(sample,channel) masks, outer scan
over the 3x5 cell specs, inner scan over the test batches — with every
suspect axis a knob, so the faulting configuration can be bisected:

  --cells N     outer scan length (1..15; the crash needs the 15-cell
                program — test/OOD evals are the cells=0 analogue)
  --batches K   inner scan length (default 39 = campaign 10000/256)
  --samples S   MC sample count (default 20 = preset)
  --method      mcdropout (masks) vs bbb/pointwise (controls)
  --remainder   include the ragged tail step (campaign: 16 rows)

RUN PROTOCOL (CLAUDE.md hazards): ONE configuration per process; run on
the otherwise-idle TPU only (NEVER while a campaign queue holds the
lock); a fault wedges the device for 10-30 min — probe-loop
`jnp.ones(3).sum()` until it recovers before the next configuration.
Prints one JSON line {"ok": true, ...} if the configuration survives.

Reference for the sweep semantics being preserved:
/root/reference/src/data.py:203-232 (rotation/shift/brightness x5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser("distortion-fault repro probe")
    p.add_argument("--cells", type=int, default=15)
    p.add_argument("--batches", type=int, default=39)
    p.add_argument("--samples", type=int, default=20)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--method", default="mcdropout",
                   choices=("mcdropout", "bbb", "pointwise"))
    p.add_argument("--remainder", type=int, default=16,
                   help="ragged tail rows (0 = no tail step)")
    p.add_argument("--mode", default="float", choices=("float", "int"))
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--ckpt", default=None,
                   help="load a trained float checkpoint (weights.msgpack) "
                        "instead of random init — rules values in/out")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qbn_tpu.config import Config
    from qbn_tpu.data.distortions import DISTORTIONS, LEVELS, gather_spec
    from qbn_tpu.evaluation import mc
    from qbn_tpu.models.factory import build_model
    from qbn_tpu.utils import init_variables

    model_name = {"mcdropout": "conv_resnet_mc", "bbb": "conv_resnet_bbb",
                  "pointwise": "conv_resnet"}[args.method]
    cfg = Config(model=model_name, dataset="cifar", output_size=10,
                 input_size=(32, 32, 3), p=0.15, sigma_prior=0.05,
                 gamma=0.01, samples=args.samples,
                 batch_size=args.batch, seed=args.seed)
    model = build_model(cfg)
    key = jax.random.PRNGKey(args.seed)
    x0 = jax.random.uniform(key, (args.batch, 32, 32, 3), jnp.float32)
    variables = init_variables(model, key, x0,
                               quantized=(args.mode == "int"))
    if args.ckpt:
        from qbn_tpu.training.checkpoint import load_variables
        variables = load_variables(variables, args.ckpt)

    step = mc.make_mc_eval(model, cfg, args.mode, args.samples, False,
                           plan=None)
    k, n_rem = args.batches, args.remainder
    run = mc._sweep_scan(step, k, n_rem, "cifar")

    # synthetic unnormalised [0,1] images, campaign-shaped
    rng = np.random.RandomState(args.seed)
    imgs = rng.randint(0, 256, (k * args.batch + n_rem, 32, 32, 3))
    x = (imgs / 255.0).astype(np.float32)
    y = rng.randint(0, 10, (len(x),)).astype(np.int32)
    xs = jnp.asarray(x[:k * args.batch].reshape(k, args.batch, 32, 32, 3))
    ys = jnp.asarray(y[:k * args.batch].reshape(k, args.batch))
    x_rem = jnp.asarray(x[k * args.batch:])
    y_rem = jnp.asarray(y[k * args.batch:])

    cells = [(d, lv) for d in DISTORTIONS for lv in range(LEVELS)]
    cells = cells[:args.cells]
    specs = [gather_spec(d, lv, 32, 32) for d, lv in cells]
    base_keys = jnp.stack([
        jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1234),
                           zlib.crc32(f"{d}{lv}".encode()) & 0x7FFFFFFF)
        for d, lv in cells])
    seed_op = jnp.asarray(args.seed * 1000003, jnp.int32)

    per_cell = jax.device_get(run(
        variables, xs, ys, x_rem, y_rem,
        *(jnp.asarray(np.stack([s[i] for s in specs])) for i in range(4)),
        base_keys, seed_op))
    print(json.dumps({
        "ok": bool(np.isfinite(per_cell["error"]).all()),
        "cells": args.cells, "batches": k, "samples": args.samples,
        "method": args.method, "mode": args.mode,
        "remainder": n_rem,
        "error0": float(per_cell["error"][0]),
    }), flush=True)


if __name__ == "__main__":
    main()
