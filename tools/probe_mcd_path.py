#!/usr/bin/env python
"""Probe which conv lowering the MC-Dropout INT eval path actually takes.

Traces one bench_suite-style chunked mcdropout INT chunk (small shapes,
CPU) and prints every convolution in the jaxpr with its operand shapes:
if the shared-weight/batched-activation custom_vmap rule (ops/integer.py
_conv_core) fired, convs appear with a folded (S*B) batch and NO leading
sample dim; per-sample or grouped shapes mean a fallback path ran."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tools.bench_suite import build_int8
from qbn_tpu.evaluation.mc import mc_predict

S, B = 4, 8


def main():
    cfg, model, variables, x = build_int8("conv_resnet_mc", "cifar", B, S,
                                          p=0.15)

    def fwd(variables, x, key):
        return mc_predict(model, variables, x, key, samples=S, mode="int")

    jaxpr = jax.make_jaxpr(fwd)(variables, x, jax.random.PRNGKey(0))
    convs = []

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                convs.append((lhs.shape, lhs.dtype.name, rhs.shape,
                              eqn.params["feature_group_count"],
                              eqn.params["batch_group_count"]))
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for u in v:
                        if hasattr(u, "jaxpr"):
                            walk(u.jaxpr)

    walk(jaxpr.jaxpr)
    print(f"{len(convs)} convs traced (S={S}, B={B}):")
    for lhs, dt, rhs, fg, bg in convs:
        tag = ""
        if lhs[0] == S * B:
            tag = "FOLDED S*B"
        elif len(lhs) == 5 or lhs[0] == S:
            tag = "PER-SAMPLE/5D  <-- fallback"
        elif lhs[0] == B:
            tag = "unbatched-x (pre-dropout or shared)"
        print(f"  lhs={lhs} {dt} rhs={rhs} fg={fg} bg={bg}  {tag}")


if __name__ == "__main__":
    main()
