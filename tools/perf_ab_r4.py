#!/usr/bin/env python
"""Same-session perf A/B: draw/compute overlap x ICDF draw (VERDICT r3 #3).

Round 3 left two roofline-sanctioned levers unmeasured end-to-end:
  * QBN_BENCH_OVERLAP — software-pipeline the bulk posterior draw against
    the previous chunk's forward (the draw is 5.6 ms of ~66 ms per 100
    samples; ROOFLINE.md puts the combined non-conv best case near ~430k);
  * QBN_DRAW_ICDF — one normal per uniform (no sqrt/sincos/divide), which
    measured 401.3k once end-to-end but never got a same-session A/B.

This driver measures all four (overlap x icdf) arms INTERLEAVED in ONE
process on the trained campaign checkpoint, >=3 timed repeats per arm, so
relay drift hits every arm equally (the round-2/3 flat-vs-natural ordering
reversed across sessions; CLAUDE.md warns single runs lie). Each arm gets
its own jit wrapper: the QBN_* draw flags are read at trace time and folded
into the eval-step memo key (evaluation/mc._trace_time_flags), so setting
the env var immediately before an arm's warmup bakes it into that arm.

Reference anchor for the loop being accelerated: the reference's
sequential per-sample MC eval (reference: experiments/utils.py:344-355).

Usage: python tools/perf_ab_r4.py [--reps 4] [--out /tmp/perf_ab_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
SAMPLES = 100
ITERS = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", default="/tmp/perf_ab_r4.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    import bench
    from qbn_tpu.evaluation.mc import presample_plan

    cfg, model, variables, x, exp_dir = bench.load_flagship()
    plan = presample_plan(variables)
    chunk = int(os.environ.get("QBN_BENCH_CHUNK", "20"))

    arms = [
        ("bulk", "off"),
        ("bulk", "on"),
        ("overlap", "off"),
        ("overlap", "on"),
    ]

    loops = {}
    key = jax.random.PRNGKey(7)
    for variant, icdf in arms:
        os.environ["QBN_DRAW_ICDF"] = icdf
        predict = bench.make_predict(model, variables, plan, chunk,
                                     overlap=(variant == "overlap"))
        loop = bench.make_loop(predict, ITERS)
        t0 = time.perf_counter()
        out = np.asarray(loop(variables, x, key))  # trace+compile+run
        assert np.all(np.isfinite(out)), (variant, icdf)
        print(f"compiled {variant}/icdf={icdf} in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        loops[(variant, icdf)] = loop

    results = {f"{v}/icdf={i}": [] for v, i in arms}
    for rep in range(args.reps):
        for ai, (variant, icdf) in enumerate(arms):
            loop = loops[(variant, icdf)]
            k = jax.random.fold_in(key, 1000 * rep + ai)
            t0 = time.perf_counter()
            out = np.asarray(loop(variables, x, k))
            dt = time.perf_counter() - t0
            assert np.all(np.isfinite(out))
            rate = BATCH * SAMPLES * ITERS / dt
            results[f"{variant}/icdf={icdf}"].append(rate)
            print(f"rep {rep} {variant}/icdf={icdf}: "
                  f"{rate / 1e3:.1f}k ex-samples/s", flush=True)

    summary = {}
    for arm, rates in results.items():
        rates = sorted(rates)
        summary[arm] = {
            "samples_k": [round(r / 1e3, 1) for r in rates],
            "median_k": round(rates[len(rates) // 2] / 1e3, 1),
            "best_k": round(rates[-1] / 1e3, 1),
        }
    blob = {"weights": exp_dir or "synthetic", "batch": BATCH,
            "samples": SAMPLES, "iters": ITERS, "chunk": chunk,
            "reps": args.reps, "arms": summary}
    with open(args.out, "w") as fh:
        json.dump(blob, fh, indent=2)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
