"""SGHMC posterior ensembles as stacked parameter pytrees.

The reference represents the SGHMC posterior as a ModuleList of snapshot
copies evaluated round-robin (reference: models_sgld.py:216-288). The
TPU-native representation is a single pytree whose leaves carry a leading
member axis: one vmapped forward evaluates every member at once, and the
member axis can be sharded over a device mesh.
"""

from __future__ import annotations

import logging
from typing import List

import jax
import jax.numpy as jnp

from qbn_tpu.training.checkpoint import load_variables, list_snapshots

log = logging.getLogger(__name__)


def stack_variables(variable_trees: List):
    """Stack N compatible variable trees along a new leading member axis."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *variable_trees)


def load_ensemble(template_variables, save_dir: str, samples: int,
                  special_info: str = ""):
    """Load the last `samples` epoch-stamped snapshots into a stacked tree
    (reference: models_sgld.py:245-261 regex + natural sort + tail-N)."""
    paths = list_snapshots(save_dir, special_info)
    if len(paths) < samples:
        raise FileNotFoundError(
            f"need {samples} snapshots matching 'weights_{special_info}N' "
            f"in {save_dir}, found {len(paths)}")
    paths = paths[-samples:]
    members = []
    for p in paths:
        log.info("loading ensemble member %s", p)
        members.append(load_variables(template_variables, p))
    return stack_variables(members)
