#!/usr/bin/env python
"""Compile the production INT merged chunk forward on TPU and dump the
optimized HLO (fusion boundaries = materialised buffers). Summarises
every top-level op in the entry computation with output shape/bytes so
HBM-traffic hotspots are visible without a profiler (the axon relay has
no xprof)."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_int8
from qbn_tpu.evaluation.mc import (mc_predict, presample_plan,
                                   draw_sampled_weights)

BATCH, CHUNK = 256, 20


def main():
    cfg, model, variables, _ = _flagship_int8(BATCH, CHUNK,
                                              weight_scale=30.0,
                                              std_value=-4.0)
    x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, 32, 32, 3),
                           jnp.float32)
    plan = presample_plan(variables)
    key = jax.random.PRNGKey(7)
    sampled = jax.eval_shape(
        lambda k: draw_sampled_weights(variables, plan, k, CHUNK), key)
    sampled = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), sampled)

    def fwd(variables, x, key, s_tree):
        return mc_predict(model, variables, x, key, samples=CHUNK,
                          mode="int", plan=plan, presampled=s_tree)

    lowered = jax.jit(fwd).lower(variables, x, key, sampled)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = "/tmp/chunk_hlo.txt"
    with open(out, "w") as fh:
        fh.write(txt)
    print(f"wrote {len(txt)} bytes to {out}", flush=True)

    # Summarise the entry computation: each op materialises its output.
    m = re.search(r"ENTRY [^{]+\{(.*?)\n\}", txt, re.S)
    body = m.group(1) if m else ""
    dt_bytes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1}

    def nbytes(shape_str):
        mm = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not mm:
            return 0
        d, dims = mm.groups()
        n = 1
        for p in dims.split(","):
            if p:
                n *= int(p)
        return n * dt_bytes.get(d, 4)

    rows = []
    for line in body.splitlines():
        mm = re.match(r"\s*(%?[\w.-]+) = (\(?)([^)]*?)\)? (\w+)\(", line)
        if not mm:
            continue
        name, is_tuple, shapes, opcode = mm.groups()
        if opcode in ("parameter", "constant", "get-tuple-element",
                      "bitcast", "tuple"):
            continue
        total = sum(nbytes(s.strip())
                    for s in re.findall(r"\w+\[[\d,]*\]\{?[^}]*\}?", shapes)
                    ) if is_tuple else nbytes(shapes)
        kind = ""
        km = re.search(r'kind=(\w+)', line)
        if km:
            kind = km.group(1)
        cm = re.search(r'calls=([\w.-]+)', line)
        called = cm.group(1) if cm else ""
        rows.append((total, name, opcode, kind, called, shapes[:70]))
    rows.sort(reverse=True)
    print(f"{'MB out':>8}  {'opcode':<12} {'kind':<18} name / called")
    for total, name, opcode, kind, called, shapes in rows[:60]:
        print(f"{total/1e6:8.1f}  {opcode:<12} {kind:<18} "
              f"{name} {called}  {shapes}")


if __name__ == "__main__":
    main()
