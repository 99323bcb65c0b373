"""Tracing / profiling / runtime-sanitising utilities.

The reference's observability is wall-clock accumulation in the Trainer
plus a never-populated latency slot (reference: src/trainer.py:20-22,
127-132; src/utils.py:218). TPU equivalents here:

  * phase_timer — accumulating wall-clock timers (train/val phases);
  * trace() — jax.profiler device trace context (view in TensorBoard or
    xprof) gated by a flag so headless runs pay nothing;
  * enable_nan_debugging — jax debug-NaN mode, the runtime-sanitiser
    analogue of the reference's NaN guards (SURVEY §5);
  * model_size_bytes — serialized parameter size (reference
    size_of_model, src/utils.py:63-67).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict

import jax

log = logging.getLogger(__name__)


class PhaseTimer:
    """Accumulating wall-clock timers keyed by phase name."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def report(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context; no-op when disabled or unsupported."""
    if not enabled:
        yield
        return
    try:
        with jax.profiler.trace(log_dir):
            yield
        log.info("profiler trace written to %s", log_dir)
    except Exception as e:  # backend may not support profiling
        log.warning("profiler trace unavailable (%s)", e)
        yield


def enable_nan_debugging() -> None:
    """Raise on the first NaN produced inside jitted code (debug mode)."""
    jax.config.update("jax_debug_nans", True)


def model_size_bytes(variables) -> int:
    """Serialized size of a variable tree in bytes."""
    from flax import serialization
    import numpy as np
    state = jax.tree.map(np.asarray, serialization.to_state_dict(variables))
    return len(serialization.msgpack_serialize(state))
