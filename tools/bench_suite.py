#!/usr/bin/env python
"""Framework-wide TPU benchmark table.

The headline bench (bench.py) measures one cell: INT8 BBB ResNet-18 MC
evaluation. This suite measures the full performance surface a user of the
reference framework would care about (reference eval loop:
experiments/utils.py:330-377; its INT path runs single-threaded FBGEMM on
CPU, so every cell here replaces a CPU-bound torch path):

  * INT8 MC evaluation throughput for each method family
    (bbb / mcdropout / pointwise) on the CIFAR ResNet-18 (w24) tier;
  * the MNIST LeNet tier (bbb);
  * serving latency: batch-1 INT8 BBB MC prediction (N=100), the
    uncertainty-aware-inference deployment shape;
  * training-step throughput (float + QAT) is covered by
    tools/microbench_train.py.

RTT-corrected chained-loop timing (CLAUDE.md relay hazards): N iterations
inside one jitted fori_loop, single device->host fetch, best of 3.

Usage: python tools/bench_suite.py [--quick]
Prints one JSON line per cell; paste into docs/BENCH_TABLE.md.
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

from qbn_tpu.config import Config
from qbn_tpu.models.factory import build_model
from qbn_tpu.utils import init_variables, apply_model, convert_model
from qbn_tpu.evaluation.mc import (aggregate, draw_sampled_weights,
                                   mc_predict, presample_plan)


def build_int8(model_name: str, dataset: str, batch: int, samples: int,
               p: float = 0.0, sigma_prior: float = 0.05,
               gamma: float = 0.01):
    """Init + observer-calibrate + convert an INT8 model (the same recipe
    as __graft_entry__._flagship_int8, generalised over the model zoo)."""
    shape = {"mnist": (28, 28, 1), "cifar": (32, 32, 3),
             "regression": (13,)}[dataset]
    cfg = Config(model=model_name, dataset=dataset, output_size=10,
                 input_size=shape, sigma_prior=sigma_prior, gamma=gamma,
                 p=p, at=True, q=True, samples=samples, batch_size=batch)
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch,) + shape, jnp.float32)
    variables = init_variables(model, key, x, quantized=True)

    # spread weights / stds so int8 logits are non-degenerate (bench.py)
    def tweak(path, prm):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if name == "std":
            return jnp.full_like(prm, -4.0)
        return prm * 30.0
    variables = dict(variables)
    variables["params"] = jax.tree_util.tree_map_with_path(
        tweak, variables["params"])
    _, _, variables = apply_model(model, variables, x, key, train=True,
                                  mode="qat", update_stats=True)
    _, _, variables = apply_model(model, variables, x, key, train=False,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, key)
    return cfg, model, variables, x


def measure_rtt():
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
    return min(ts)


def timed_loop(fn, args, iters: int, rtt: float, reps: int = 3):
    """Chained fori_loop timing of fn(*args, i_key) -> (B, 10).

    CONVENTION: ``args[-1]`` MUST be the float input tensor. The loop
    body perturbs it per iteration (see below) and calls
    ``fn(*args[:-1], perturbed_input, i_key)`` — a caller whose trailing
    arg is not the input would get the wrong operand perturbed.

    The trip count is a TRACED operand (dynamic while-loop bound), so the
    loop auto-scales for fast programs without recompiling: a cell whose
    whole loop finishes in ~one relay RTT would otherwise measure noise —
    the round-4 first pass printed a NEGATIVE per-batch time for the
    pointwise cell (12 iterations < 26 ms RTT) and a faster-than-physics
    ensemble cell. Iterations are grown until the best rep costs at least
    max(40 x RTT, 0.5 s), so the RTT correction is <=2.5% of the total.
    """

    @jax.jit
    def loop(n, *a):
        def body(i, acc):
            # keep the INPUT loop-variant too: deterministic INT cells
            # (pointwise, sgld ensemble members) never consume the RNG
            # key, and XLA hoists the then-loop-invariant forward out of
            # the loop — the round-4 first pass measured the pointwise
            # cell NEGATIVE and the 7-member ensemble at 0.31 ms this way
            x = a[-1] + jnp.float32(1e-7) * jnp.float32(i)
            return acc + fn(*a[:-1], x,
                            jax.random.fold_in(jax.random.PRNGKey(11), i))
        return lax.fori_loop(0, n, body, jnp.zeros(()))

    np.asarray(loop(jnp.int32(2), *args))  # compile + warmup

    def measure(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = np.asarray(loop(jnp.int32(n), *args))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(out)
        return best

    floor = max(40 * rtt, 0.5)
    best = measure(iters)
    while best < floor and iters < 200_000:
        iters = int(iters * max(2.0, 1.3 * floor / max(best, 1e-4)))
        best = measure(iters)
    return (best - rtt) / iters


def mc_eval_cell(name, model_name, dataset, batch, samples, rtt, iters,
                 p=0.0, chunk=None, ensemble=False):
    cfg, model, variables, x = build_int8(model_name, dataset, batch,
                                          samples, p=p)
    if ensemble:
        # SGHMC posterior ensemble: `samples` stacked INT8 member trees
        # evaluated by ONE vmapped forward (evaluation/ensemble.py) — the
        # reference's round-robin ModuleList path (models_sgld.py:216-288).
        members = jax.tree.map(
            lambda l: jnp.stack([l] * samples), variables)

        def fn(members, x, key):
            outs = mc_predict(model, members, x, key, samples=samples,
                              mode="int", ensemble=True)
            return aggregate("classification", outs, samples).sum()

        dt = timed_loop(fn, (members, x), iters, rtt)
        rec = {
            "cell": name, "batch": batch, "samples": samples,
            "ms_per_batch": round(dt * 1e3, 2),
            "example_samples_per_sec": round(batch * samples / dt, 1),
        }
        print(json.dumps(rec), flush=True)
        return rec
    plan = presample_plan(variables) if samples > 1 else None

    if chunk and samples > chunk:
        # chunked-scan over the sample axis to bound HBM residency
        if plan is not None:
            # production bulk-draw + chunked-scan path (bench.py)
            def predict(variables, x, key):
                k_w, key = jax.random.split(key)
                sampled = draw_sampled_weights(variables, plan, k_w,
                                               samples)
                sampled = jax.tree.map(
                    lambda l: l.reshape((samples // chunk, chunk)
                                        + l.shape[1:]), sampled)
                keys = jax.random.split(key, samples // chunk)

                def body(carry, sk):
                    s_tree, k = sk
                    outs = mc_predict(model, variables, x, k,
                                      samples=chunk, mode="int",
                                      plan=plan, presampled=s_tree)
                    return carry + jnp.sum(outs, axis=0), 0.0

                total, _ = lax.scan(body, jnp.zeros((batch, 10)),
                                    (sampled, keys))
                return total / samples
        else:
            # no presampling plan (e.g. mcdropout): scan plain chunks
            def predict(variables, x, key):
                keys = jax.random.split(key, samples // chunk)

                def body(carry, k):
                    outs = mc_predict(model, variables, x, k,
                                      samples=chunk, mode="int")
                    return carry + jnp.sum(outs, axis=0), 0.0

                total, _ = lax.scan(body, jnp.zeros((batch, 10)), keys)
                return total / samples
    else:
        task = "regression" if dataset == "regression" else "classification"

        def predict(variables, x, key):
            outs = mc_predict(model, variables, x, key, samples=samples,
                              mode="int", plan=plan)
            return aggregate(task, outs, samples)

    def fn(variables, x, key):
        out = predict(variables, x, key)
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out))

    dt = timed_loop(fn, (variables, x), iters, rtt)
    rec = {
        "cell": name, "batch": batch, "samples": samples,
        "ms_per_batch": round(dt * 1e3, 2),
        "example_samples_per_sec": round(batch * samples / dt, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer loop iters (still RTT-corrected)")
    ap.add_argument("--only", default=None,
                    help="comma-separated cell-name substrings to run")
    ap.add_argument("--write", action="store_true",
                    help="render docs/BENCH_TABLE.md from the results")
    args = ap.parse_args()
    iters = 4 if args.quick else 12

    print("devices:", jax.devices(), flush=True)
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)

    cells = [
        ("resnet_bbb_int8_mc", dict(model_name="conv_resnet_bbb",
                                    dataset="cifar", batch=256,
                                    samples=100, chunk=20)),
        ("resnet_mcdropout_int8_mc", dict(model_name="conv_resnet_mc",
                                          dataset="cifar", batch=256,
                                          samples=100, p=0.15, chunk=20)),
        ("resnet_pointwise_int8", dict(model_name="conv_resnet",
                                       dataset="cifar", batch=256,
                                       samples=1)),
        ("resnet_sgld_ensemble7_int8", dict(model_name="conv_resnet",
                                            dataset="cifar", batch=256,
                                            samples=7, ensemble=True)),
        ("lenet_bbb_int8_mc", dict(model_name="conv_lenet_bbb",
                                   dataset="mnist", batch=256,
                                   samples=100, chunk=None)),
        ("mlp_bbb_int8_mc", dict(model_name="linear_bbb",
                                 dataset="regression", batch=256,
                                 samples=100, chunk=None)),
        ("serving_latency_resnet_bbb_int8_b1", dict(
            model_name="conv_resnet_bbb", dataset="cifar", batch=1,
            samples=100, chunk=None)),
    ]
    recs = []
    for name, kw in cells:
        if args.only and not any(s in name
                                 for s in args.only.split(",")):
            continue
        try:
            recs.append(mc_eval_cell(name, rtt=rtt, iters=iters, **kw))
        except Exception as e:  # keep the rest of the table alive
            print(json.dumps({"cell": name, "error": repr(e)[:300]}),
                  flush=True)
    if args.write and recs:
        lines = [
            "# Framework benchmark table (real TPU v5e)", "",
            "Generated by `python tools/bench_suite.py --write` — "
            "RTT-corrected chained-loop timing (see the module "
            "docstring for methodology). INT8 cells; the reference's "
            "equivalents run single-threaded FBGEMM on CPU.", "",
            "| cell | batch | MC samples | ms/batch | example-samples/s |",
            "|---|---|---|---|---|",
        ]
        for r in recs:
            lines.append(
                f"| {r['cell']} | {r['batch']} | {r['samples']} | "
                f"{r['ms_per_batch']} | "
                f"{r['example_samples_per_sec']:,.0f} |")
        lines.append("")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "BENCH_TABLE.md")
        with open(path, "w") as fh:
            fh.write("\n".join(lines))
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
