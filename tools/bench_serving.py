#!/usr/bin/env python
"""Serving-artifact latency/throughput bench (VERDICT r2 #7).

Freezes a TRAINED experiment checkpoint into the AOT artifact
(qbn_tpu.serving), reloads it from disk the way a serving host would
(no framework model code on the call path), and measures `call()`:

  * chained-loop throughput: N calls inside one jitted fori_loop with a
    single device->host fetch (the relay-safe convention from bench.py —
    per-call host timing through the axon tunnel pays ~100-200 ms RTT
    and block_until_ready can return early);
  * per-call latency: median wall time of individual call()s INCLUDING
    the relay round trip — the number a remote client would see.

Reference gap: the reference has no serving story at all (checkpoints
reload into the full Python stack, src/utils.py:112-123).

Usage:
  python tools/bench_serving.py --exp /root/campaign_runs/<qat-exp-dir> \
      [--batch 256] [--samples 100] [--chunk 20] [--batch1]
Prints one JSON line per cell.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser("serving artifact bench")
    p.add_argument("--exp", required=True,
                   help="experiment dir with a converted INT checkpoint "
                        "(config.json + weights.msgpack)")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--samples", type=int, default=100)
    p.add_argument("--chunk", type=int, default=20)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--artifact", default=None,
                   help="artifact dir (default: temp dir)")
    p.add_argument("--freeze_draws", type=int, default=None,
                   metavar="SEED",
                   help="also bench a batch-1 artifact with the posterior "
                        "sample bank frozen at export (see qbn_tpu.serving "
                        "--freeze_draws)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qbn_tpu.serving.__main__ import main as export_main
    from qbn_tpu.serving.export import load_predictor
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_suite import measure_rtt

    rtt = measure_rtt()
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2)}), flush=True)

    artifact = args.artifact or tempfile.mkdtemp(prefix="qbn_artifact_")
    # 1) freeze: the production export path (CLI), batch + batch-1 variants
    export_main(["--exp", args.exp, "--out", artifact,
                 "--mode", "int", "--batch", str(args.batch),
                 "--samples", str(args.samples), "--use_plan",
                 "--chunk", str(args.chunk)])
    # batch-1 artifacts are UNCHUNKED: the merged conv's output width is
    # samples x cout, so at batch 1 the full 100-sample merge is what
    # fills the MXU lanes (the chunked batch-256 program chunks to bound
    # weight-code HBM, a non-issue at batch 1)
    artifact1 = artifact + "_b1"
    export_main(["--exp", args.exp, "--out", artifact1,
                 "--mode", "int", "--batch", "1",
                 "--samples", str(args.samples), "--use_plan"])
    cells = [("batch", artifact), ("batch1", artifact1)]
    if args.freeze_draws is not None:
        # frozen-draw variants: the posterior sample bank is baked into
        # the artifact as constants, so the per-call Pallas draw (5.6 ms
        # per 100 flagship samples, batch-independent — the dominant
        # batch-1 cost and ~8% of the batch-256 program) vanishes
        # (fixed-ensemble serving semantics)
        for bname, bsz, ck in (("batch_frozen", args.batch, args.chunk),
                               ("batch1_frozen", 1, None)):
            art_f = artifact + f"_{bname}"
            cmd = ["--exp", args.exp, "--out", art_f,
                   "--mode", "int", "--batch", str(bsz),
                   "--samples", str(args.samples), "--use_plan",
                   "--freeze_draws", str(args.freeze_draws)]
            if ck is not None:
                cmd += ["--chunk", str(ck)]
            export_main(cmd)
            cells.append((bname, art_f))

    results = []
    for name, art in cells:
        pred = load_predictor(art)
        b = pred.manifest["batch"]
        x = np.random.RandomState(0).rand(
            b, *pred.manifest["input_shape"]).astype(np.float32)

        # chained-loop throughput: the exported program traced inside a
        # jitted fori_loop, one fetch for all iterations
        xj = jnp.asarray(x)

        @jax.jit
        def loop(n, xv, seed0):
            def body(i, acc):
                # the input must be LOOP-VARIANT: a frozen-bank artifact
                # (--freeze_draws) ignores its seed operand, and XLA then
                # hoists the whole loop-invariant call out of the fori_loop
                # — the round-4 first pass measured 5.2M ex-samples/s
                # (~13x the conv roofline) this way. A per-iteration input
                # perturbation keeps the real datapath inside the loop and
                # costs one elementwise add on x.
                out = pred.exported.call(
                    xv + jnp.float32(1e-7) * jnp.float32(i), seed0 + i)
                return acc + out
            # traced trip count (lowers to a while loop): iterations can
            # grow without recompiling, matching bench_suite.timed_loop
            return jax.lax.fori_loop(
                0, n, body, jnp.zeros((b, 10), jnp.float32))

        out = np.asarray(loop(jnp.int32(2), xj,
                              jnp.asarray(0, jnp.int32)))  # warmup
        assert np.all(np.isfinite(out))

        def measure(n):
            best = float("inf")
            for rep in (1, 2):
                t0 = time.perf_counter()
                np.asarray(loop(jnp.int32(n), xj,
                                jnp.asarray(rep, jnp.int32)))
                best = min(best, time.perf_counter() - t0)
            return best

        # grow iterations until the loop wall time dominates the relay
        # RTT (same floor as bench_suite.timed_loop): a ~130 ms batch-1
        # frozen-cell loop at fixed iters=16 otherwise carries an
        # uncorrected 26-200 ms RTT (ADVICE r4)
        iters = args.iters
        floor = max(40 * rtt, 0.5)
        dt = measure(iters)
        while dt < floor and iters < 200_000:
            iters = int(iters * max(2.0, 1.3 * floor / max(dt, 1e-4)))
            dt = measure(iters)
        dt -= rtt
        ex_sps = b * args.samples * iters / dt
        results.append({
            "metric": f"serving artifact MC throughput ({name}={b}, "
                      f"N={args.samples}, INT8)",
            "value": round(ex_sps, 1),
            "unit": "example-samples/sec",
            "per_call_ms_amortized": round(1e3 * dt / iters, 3),
            "iters": iters,
        })

        # per-call latency incl. relay RTT (what a remote client sees)
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            np.asarray(pred.call(x, 100 + i))
            times.append(time.perf_counter() - t0)
        results.append({
            "metric": f"serving artifact call() latency ({name}={b}, "
                      f"N={args.samples}, INT8, incl. host round trip)",
            "value": round(1e3 * float(np.median(times)), 2),
            "unit": "ms",
        })

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
