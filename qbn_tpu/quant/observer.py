"""Moving-average min/max observers as pure functions over explicit state.

Functional equivalent of torch.quantization.MovingAverageMinMaxObserver as
used by the reference QConfig (reference: src/quant_utils.py:129-138).
Observer state is a small pytree carried in a model's 'quant' collection —
the same way BatchNorm running statistics are carried — instead of being
hidden inside mutable modules.

Semantics matched:
  * first update sets (min, max) to the batch extrema; later updates apply
    an exponential moving average with averaging constant 0.01;
  * qparams use the affine per-tensor formula with the range widened to
    include zero, scale floored at float32 eps, and the zero point rounded
    and clamped into [qmin, qmax].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

AVERAGING_CONSTANT = 0.01
# Minimum representable scale (float32 machine epsilon, matching the torch
# observer's eps floor).
SCALE_EPS = float(np.finfo(np.float32).eps)

_INF = jnp.inf


def obs_init():
    """Fresh observer state: sentinel extrema mark 'not yet initialised'."""
    return {
        "min_val": jnp.asarray(_INF, jnp.float32),
        "max_val": jnp.asarray(-_INF, jnp.float32),
    }


def obs_update(state, x, averaging_constant: float = AVERAGING_CONSTANT):
    """One moving-average min/max update. Returns new state.

    The first call (sentinel state) adopts the batch extrema directly;
    subsequent calls blend with factor `averaging_constant`.
    """
    x = x.astype(jnp.float32)
    mn = jnp.min(x)
    mx = jnp.max(x)
    old_mn = state["min_val"]
    old_mx = state["max_val"]
    fresh = jnp.isinf(old_mn)
    new_mn = jnp.where(fresh, mn, old_mn + averaging_constant * (mn - old_mn))
    new_mx = jnp.where(fresh, mx, old_mx + averaging_constant * (mx - old_mx))
    return {"min_val": new_mn, "max_val": new_mx}


def obs_is_initialized(state):
    return jnp.logical_not(jnp.isinf(state["min_val"]))


def calculate_qparams(min_val, max_val, qmin: int, qmax: int):
    """Per-tensor affine (scale, zero_point) from observed extrema.

    Matches the torch observer qparams computation: the observed range is
    widened to include zero, scale = range / (qmax - qmin) floored at eps,
    zero_point = qmin - round(min/scale) clamped into [qmin, qmax].

    Uninitialised state (inf sentinels) yields scale 1.0, zero_point 0 —
    the same degenerate default torch produces for a never-updated observer.
    """
    min_val = jnp.asarray(min_val, jnp.float32)
    max_val = jnp.asarray(max_val, jnp.float32)
    fresh = jnp.isinf(min_val)
    min_val = jnp.where(fresh, 0.0, min_val)
    max_val = jnp.where(fresh, 0.0, max_val)

    min_neg = jnp.minimum(min_val, 0.0)
    max_pos = jnp.maximum(max_val, 0.0)
    scale = (max_pos - min_neg) / float(qmax - qmin)
    scale = jnp.maximum(scale, SCALE_EPS)
    scale = jnp.where(fresh, 1.0, scale)
    zero_point = qmin - jnp.round(min_neg / scale)
    zero_point = jnp.clip(zero_point, qmin, qmax)
    zero_point = jnp.where(fresh, 0.0, zero_point).astype(jnp.int32)
    return scale, zero_point
