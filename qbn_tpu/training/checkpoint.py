"""Checkpointing: msgpack variable trees with key-intersection restore.

Equivalent of the reference's save_model/load_model
(reference: src/utils.py:84-123): checkpoints are written per epoch (last or
best), SGHMC writes epoch-stamped posterior snapshots, and restoring
intersects keys so float checkpoints load into quantised models (whose extra
'quant'/'qconst' collections keep their initialised values).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _natural_key(text: str):
    return [int(c) if c.isdigit() else c
            for c in re.split(r"(-?\d+)", text)]


def save_variables(variables, path: str) -> None:
    state = serialization.to_state_dict(variables)
    state = jax.tree.map(np.asarray, state)
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(state))


def model_size_mb(variables) -> float:
    """Serialized model size in MB (reference: size_of_model,
    src/utils.py:63-67 — file size of the saved state dict)."""
    state = serialization.to_state_dict(variables)
    state = jax.tree.map(np.asarray, state)
    return len(serialization.msgpack_serialize(state)) / 1e6


def _merge(target, restored):
    """Recursively take restored values where keys and shapes line up."""
    if isinstance(target, dict):
        if not isinstance(restored, dict):
            return target
        return {k: (_merge(v, restored[k]) if k in restored else v)
                for k, v in target.items()}
    if restored is None:
        return target
    r = jnp.asarray(restored)
    t = jnp.asarray(target)
    if r.shape != t.shape:
        return target
    return r.astype(t.dtype)


def load_variables(variables, path: str):
    """Restore into `variables`, intersecting keys (missing/mismatched
    entries keep their current values, like the reference's load_model)."""
    with open(path, "rb") as fh:
        restored = serialization.msgpack_restore(fh.read())
    merged = _merge(serialization.to_state_dict(variables), restored)
    return serialization.from_state_dict(variables, merged)


def save_config(cfg, path: str) -> None:
    with open(path, "w") as fh:
        json.dump(dataclasses.asdict(cfg), fh, indent=2, default=str)


def checkpoint_path(save_dir: str, special_info: str = "") -> str:
    return os.path.join(save_dir, f"weights{special_info}.msgpack")


def list_snapshots(save_dir: str, special_info: str = "") -> List[str]:
    """Epoch-stamped SGHMC snapshots 'weights_<info><epoch>.msgpack' in
    natural order (reference: models_sgld.py:245-261)."""
    pat = re.compile(r"weights_" + re.escape(special_info)
                     + r"[0-9]+\.msgpack$")
    names = [f for f in os.listdir(save_dir) if pat.fullmatch(f)]
    names.sort(key=_natural_key)
    return [os.path.join(save_dir, n) for n in names]
