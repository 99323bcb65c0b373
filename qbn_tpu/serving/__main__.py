"""Serving-export CLI: freeze an experiment checkpoint into an AOT
serving artifact.

  python -m qbn_tpu.serving --exp <exp-dir> --out <artifact-dir> \
      [--mode int] [--batch 256] [--samples 100] [--platforms tpu] \
      [--use_plan --chunk 20] [--cpu]

<exp-dir> is a directory written by experiments/run.py (config.json +
weights.msgpack — for INT artifacts, the QAT phase's checkpoint already
holds the converted 'qconst' codes). The default mode follows the
experiment's own q flag.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser("qbn_tpu.serving")
    p.add_argument("--exp", required=True,
                   help="experiment dir (config.json + weights.msgpack)")
    p.add_argument("--out", required=True, help="artifact output dir")
    p.add_argument("--mode", default=None,
                   choices=[None, "float", "qat", "int"],
                   help="forward family; default: 'int' when the "
                        "experiment config is quantised, else 'float'")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--samples", type=int, default=None,
                   help="MC samples baked into the program "
                        "(default: the experiment's --samples)")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. 'tpu' "
                        "or 'tpu,cpu' (default: current backend)")
    p.add_argument("--use_plan", action="store_true",
                   help="INT only: fused bulk-draw + merged-channel "
                        "formulation (TPU lowering target)")
    p.add_argument("--chunk", type=int, default=None,
                   help="with --use_plan: consume presampled codes in "
                        "chunks of this size")
    p.add_argument("--freeze_draws", type=int, default=None,
                   metavar="SEED",
                   help="with --use_plan: draw the posterior weight "
                        "samples ONCE at export (this seed) and bake the "
                        "int8 codes into the artifact — no per-call draw "
                        "(fixed-ensemble serving; cuts batch-1 latency)")
    p.add_argument("--cpu", action="store_true",
                   help="run the export on the CPU backend (safe on "
                        "hosts where the default backend is an "
                        "exclusive TPU)")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qbn_tpu.config import Config
    from qbn_tpu.models.factory import build_model
    from qbn_tpu.serving.export import export_predictor
    from qbn_tpu.training.checkpoint import (checkpoint_path,
                                             load_variables)
    from qbn_tpu.utils import init_variables

    with open(os.path.join(args.exp, "config.json")) as fh:
        cfg_d = json.load(fh)
    known = {k: v for k, v in cfg_d.items()
             if k in Config.__dataclass_fields__}
    if isinstance(known.get("input_size"), list):
        known["input_size"] = tuple(known["input_size"])
    cfg = Config(**known)
    mode = args.mode or ("int" if cfg.q else "float")
    quantized = mode in ("qat", "int")

    model = build_model(cfg, quantized=quantized or None)
    input_shape = tuple(cfg.input_size)
    x0 = jnp.zeros((2,) + input_shape, jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), x0,
                               quantized=quantized)
    variables = load_variables(variables, checkpoint_path(args.exp))

    platforms = args.platforms.split(",") if args.platforms else None
    blob = export_predictor(
        model, variables, cfg, mode=mode, batch=args.batch,
        input_shape=input_shape, path=args.out, samples=args.samples,
        use_plan=args.use_plan, chunk=args.chunk,
        freeze_draws=args.freeze_draws, platforms=platforms)
    with open(os.path.join(args.out, "manifest.json")) as fh:
        print(fh.read())
    print(f"wrote {blob} ({os.path.getsize(blob)/1e6:.2f} MB)")


if __name__ == "__main__":
    main(sys.argv[1:])
