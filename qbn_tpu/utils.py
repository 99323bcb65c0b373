"""Shared helpers: model init/apply sugar, KL extraction, checkpoint naming.

The reference threads a mutable args namespace and relies on module state;
here every piece of state is an explicit pytree and these helpers keep the
call sites small.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def split_rngs(key, train: bool = False):
    """Standard rng streams for model application."""
    k_noise, k_drop = jax.random.split(key)
    return {"noise": k_noise, "dropout": k_drop}


def scan_enabled(env_var: str) -> bool:
    """Whether a whole-epoch/whole-split lax.scan fast path should run.

    The scan paths exist to amortise the axon relay's per-dispatch cost on
    TPU (one dispatch + one fetch per epoch/split). On XLA **CPU** they are
    a measured catastrophe: convolutions inside a scan body lose the Eigen
    runtime fast path and fall back to naive LLVM loop nests (LeNet train
    step 0.44 s -> 9.98 s/step, 23x, measured on this host). So the
    default is backend-gated: on for any accelerator (the TPU platform is
    named 'axon' through this host's relay), off for CPU. `env_var`:
    "on" forces the scan (tests exercise it on CPU at tiny shapes),
    "off" disables it everywhere.
    """
    import os
    v = os.environ.get(env_var, "auto")
    if v == "on":
        return True
    if v == "off":
        return False
    return jax.default_backend() != "cpu"


def init_variables(model, key, sample_input, quantized: bool = False):
    """Initialise the full variable tree.

    Quantised models are initialised in 'convert' mode so that the 'quant'
    observer and 'qconst' integer-constant collections exist from the start
    (they are filled by training / conversion later).
    """
    mode = "convert" if quantized else "float"
    k_params, k_apply = jax.random.split(key)
    rngs = {"params": k_params, **split_rngs(k_apply)}
    return model.init(rngs, sample_input, train=False, mode=mode,
                      update_stats=False)


def sum_kl(kl_collection) -> jax.Array:
    """Sum every sow'n KL leaf into one scalar."""
    leaves = jax.tree_util.tree_leaves(kl_collection)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    return sum(jnp.sum(l) for l in leaves)


def apply_model(model, variables, x, key, *, train: bool, mode: str,
                update_stats: bool = False):
    """Apply a model; returns (output, kl, new_variables).

    Mutable collections are selected from (train, update_stats):
    'batch_stats' and 'quant' update during (QAT) training; 'kl' is always
    collected so the ELBO loss can use it.
    """
    mutable = ["kl"]
    if update_stats:
        mutable += ["batch_stats", "quant"]
    out, updates = model.apply(
        variables, x, train=train, mode=mode, update_stats=update_stats,
        rngs=split_rngs(key), mutable=mutable)
    kl = sum_kl(updates.get("kl", {}))
    new_vars = dict(variables)
    for col in ("batch_stats", "quant"):
        if col in updates:
            new_vars[col] = updates[col]
    return out, kl, new_vars


def convert_model(model, variables, sample_input, key):
    """Run the conversion pass: compute 'qconst' integer constants from the
    trained observers + BN statistics (the reference's convert()/from_float
    step, reference: src/quant_utils.py:62-110)."""
    _, updates = model.apply(
        variables, sample_input, train=False, mode="convert",
        update_stats=False, rngs=split_rngs(key), mutable=["qconst", "kl"])
    new_vars = dict(variables)
    new_vars["qconst"] = updates["qconst"]
    return new_vars
