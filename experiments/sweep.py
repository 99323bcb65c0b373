#!/usr/bin/env python
"""Full experiment grid driver — replaces run_all_float.sh / run_all_quant.sh.

Float grid (reference: run_all_float.sh:6-44): for each (method x tier),
3 seeds, then average.

Quant grid (reference: run_all_quant.sh:7-62): for each float 'default'
checkpoint, sweep weight precision w in {3..8} at a=7, and activation
precision a in {3..6} at w=8, each into an 'a_A_w_W' subdirectory; 3 seeds
averaged.

Usage:
  python experiments/sweep.py float --methods bbb --tiers cifar --seeds 1 2 3
  python experiments/sweep.py quant --methods bbb --tiers cifar \
      --load not_q-cifar-... [--seeds 1 2 3]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from experiments import average_results  # noqa: E402
from experiments.run import main as run_main  # noqa: E402

WEIGHT_SWEEP = [8, 7, 6, 5, 4, 3]          # at a=7
ACTIVATION_SWEEP = [6, 5, 4, 3]            # at w=8

# Transient relay/device failure markers (round-5 incident: a
# "remote_compile: read body: response body closed before all bytes
# were read" INTERNAL error killed a quant cell mid-compile while the
# very next TPU process ran fine; UNAVAILABLE is the TPU-worker-restart
# signature from rounds 3/4). Anything else re-raises immediately.
TRANSIENT = ("remote_compile", "UNAVAILABLE", "DEADLINE_EXCEEDED",
             "response body closed", "Socket closed")
RETRY_COOLDOWN_S = 120


def _run_cell(argv, d: str, attempts: int = 2) -> None:
    """One grid-cell run with bounded retry on TRANSIENT relay/device
    failures: clear the half-written dir, cool down (a restarting TPU
    worker needs time; a still-wedged one just blocks the retry, which
    is the safe behaviour), run again. Non-transient errors and the
    final attempt re-raise so a real code fault still stops the grid."""
    for attempt in range(attempts):
        try:
            run_main(argv)
            return
        except Exception as e:  # noqa: BLE001 — marker-filtered below
            msg = repr(e)
            if (attempt + 1 >= attempts
                    or not any(t in msg for t in TRANSIENT)):
                raise
            print(f"[sweep] transient failure on {d}, retrying after "
                  f"{RETRY_COOLDOWN_S}s: {msg[:200]}", flush=True)
            time.sleep(RETRY_COOLDOWN_S)
            _fresh_dir(d)


def _fresh_dir(d: str) -> None:
    """Clear a half-written cell dir before rerunning it: setup_experiment
    nests a timestamped subdir when --save already EXISTS, so resuming an
    interrupted cell over its leftovers would strand the rerun's artifacts
    one level down and leave the stale top-level results.json to poison
    the aggregate (observed in the round-3 campaign resume)."""
    if os.path.isdir(d) and not os.path.exists(os.path.join(d, "DONE")):
        shutil.rmtree(d)


def main(argv=None):
    p = argparse.ArgumentParser("experiment grid sweep")
    p.add_argument("grid", choices=["float", "quant"])
    p.add_argument("--methods", nargs="+",
                   default=["pointwise", "mcdropout", "bbb", "sgld"])
    p.add_argument("--tiers", nargs="+",
                   default=["regression", "mnist", "cifar"])
    p.add_argument("--seeds", nargs="+", type=int, default=[1, 2, 3])
    p.add_argument("--load", default=None,
                   help="float experiment dir (quant grid); '{seed}' is "
                        "substituted per seed. Default: the float grid's "
                        "own '<out>/<method>-<tier>-seed<seed>' layout")
    p.add_argument("--out", default="sweeps")
    p.add_argument("--cells", nargs="*", default=None,
                   help="restrict the quant grid to cells 'a_A_w_W'")
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                   help="extra flags passed through to run.py (captures "
                        "everything after --extra, including --flags; put "
                        "it last)")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    for method in args.methods:
        for tier in args.tiers:
            if args.grid == "float":
                run_dirs = []
                for seed in args.seeds:
                    d = os.path.join(args.out,
                                     f"{method}-{tier}-seed{seed}")
                    if not os.path.exists(os.path.join(d, "DONE")):
                        _fresh_dir(d)
                        _run_cell(["--method", method, "--tier", tier,
                                   "--phase", "float",
                                   "--seed", str(seed),
                                   "--save", d] + args.extra, d)
                    run_dirs.append(d)
                average_results.main(
                    run_dirs + ["--save",
                                os.path.join(args.out,
                                             f"{method}-{tier}-avg")])
            else:
                cells = ([(7, w) for w in WEIGHT_SWEEP]
                         + [(a, 8) for a in ACTIVATION_SWEEP])
                if args.cells:
                    cells = [(int(c.split("_")[1]), int(c.split("_")[3]))
                             for c in args.cells]
                for a_bits, w_bits in cells:
                    cell = f"a_{a_bits}_w_{w_bits}"
                    run_dirs = []
                    for seed in args.seeds:
                        load = (args.load.replace("{seed}", str(seed))
                                if args.load else
                                os.path.join(
                                    args.out,
                                    f"{method}-{tier}-seed{seed}"))
                        d = os.path.join(
                            args.out,
                            f"{method}-{tier}-{cell}-seed{seed}")
                        if not os.path.exists(os.path.join(d, "DONE")):
                            _fresh_dir(d)
                            _run_cell(
                                ["--method", method, "--tier", tier,
                                 "--phase", "qat", "--load", load,
                                 "--seed", str(seed),
                                 "--activation_precision", str(a_bits),
                                 "--weight_precision", str(w_bits),
                                 "--save", d] + args.extra, d)
                        run_dirs.append(d)
                    average_results.main(
                        run_dirs + ["--save",
                                    os.path.join(
                                        args.out,
                                        f"{method}-{tier}-{cell}-avg")])


if __name__ == "__main__":
    main()
