"""Per-tensor affine (de/re/fake-)quantisation with straight-through gradients.

Functional equivalents of torch's fake_quantize_per_tensor_affine /
quantize_per_tensor as exercised by the reference QAT pipeline
(reference: src/quant_utils.py:129-138, src/models/stochastic/bbb/quantized/
linear_qat.py:18-41). The straight-through estimator passes unit gradient
inside the representable range and zero outside, matching the torch kernel.

All rounding is round-half-to-even (jnp.round == std::nearbyint).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def quantize(x, scale, zero_point, qmin: int, qmax: int, dtype=jnp.int8):
    """Real quantisation to integer codes: clamp(round(x/scale) + zp)."""
    scale = lax.stop_gradient(scale)
    zero_point = lax.stop_gradient(zero_point)
    q = jnp.round(x / scale) + zero_point
    q = jnp.clip(q, qmin, qmax)
    return q.astype(dtype)


def dequantize(q, scale, zero_point):
    """Integer codes back to float: (q - zp) * scale."""
    return (q.astype(jnp.float32) - jnp.asarray(zero_point, jnp.float32)) * scale


def fake_quantize(x, scale, zero_point, qmin: int, qmax: int):
    """Quantise-dequantise round trip with straight-through gradient.

    Forward: (clamp(round(x/scale + zp), qmin, qmax) - zp) * scale.
    Backward: identity where round(x/scale + zp) lands inside [qmin, qmax],
    zero outside (torch FakeQuantize semantics).
    """
    scale = lax.stop_gradient(jnp.asarray(scale, jnp.float32))
    zero_point = lax.stop_gradient(jnp.asarray(zero_point, jnp.float32))
    q = jnp.round(x / scale + zero_point)
    mask = (q >= qmin) & (q <= qmax)
    y = (jnp.clip(q, qmin, qmax) - zero_point) * scale
    # Straight-through: gradient 1 inside the range, 0 outside.
    return jnp.where(mask, x + lax.stop_gradient(y - x), lax.stop_gradient(y))


def requantize(q, in_scale, in_zero_point, out_scale, out_zero_point,
               qmin: int, qmax: int, dtype=jnp.int8):
    """Re-express integer codes on a new (scale, zero_point) grid.

    Equivalent to dequantise -> quantise; used for quantised add/mul ops
    (the QFunctional pattern in the reference's converted int modules,
    reference: src/models/stochastic/bbb/quantized/linear_q.py:91).
    """
    x = dequantize(q, in_scale, in_zero_point)
    return quantize(x, out_scale, out_zero_point, qmin, qmax, dtype=dtype)


def quantized_add(qa, scale_a, zp_a, qb, scale_b, zp_b,
                  out_scale, out_zp, qmin: int, qmax: int, dtype=jnp.int8):
    """c = requant(deq(a) + deq(b)) — quantised elementwise add."""
    x = dequantize(qa, scale_a, zp_a) + dequantize(qb, scale_b, zp_b)
    return quantize(x, out_scale, out_zp, qmin, qmax, dtype=dtype)


def quantized_mul(qa, scale_a, zp_a, qb, scale_b, zp_b,
                  out_scale, out_zp, qmin: int, qmax: int, dtype=jnp.int8):
    """c = requant(deq(a) * deq(b)) — quantised elementwise multiply."""
    x = dequantize(qa, scale_a, zp_a) * dequantize(qb, scale_b, zp_b)
    return quantize(x, out_scale, out_zp, qmin, qmax, dtype=dtype)
