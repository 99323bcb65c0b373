"""Stochastic layer math: local reparametrisation and weight-space sampling.

XLA reference implementations of the Bayes-by-backprop forward modes
(reference: src/models/stochastic/bbb/linear.py:30-52, conv.py:23-40).
These are the correctness oracles for the fused Pallas kernels in
qbn_tpu.ops.pallas.

Conventions: NHWC activations, HWIO conv kernels, dense kernels (in, out).
All RNG is drawn in float32 (the reference's global RNG contract,
reference: README.md:49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

VAR_EPS = 1e-8  # epsilon under the sqrt of the local-reparam std


def softplus(x):
    return jnp.logaddexp(x, 0.0)


def kl_divergence(mu, sigma, mu_prior, sigma_prior):
    """Closed-form KL(N(mu, sigma) || N(mu_prior, sigma_prior)), summed.

    (reference: src/models/stochastic/bbb/utils_bbb.py:3-5)
    """
    return 0.5 * jnp.sum(
        2.0 * jnp.log(sigma_prior / sigma)
        - 1.0
        + (sigma / sigma_prior) ** 2
        + ((mu_prior - mu) / sigma_prior) ** 2
    )


def local_reparam_dense(x, w, sp_std, key, bias=None):
    """Training-mode BBB dense layer via the local reparametrisation trick.

    out = x @ w + sqrt(1e-8 + x^2 @ sp_std^2) * eps (+ bias), with
    per-activation Gaussian noise eps — two matmuls that share the x tile
    (the fusion target for the Pallas kernel).

    Args:
      x: (B, in) activations.
      w: (in, out) posterior mean.
      sp_std: (in, out) posterior std (already softplus'd).
      key: PRNG key for the per-activation noise.
    """
    mean = jnp.dot(x, w, preferred_element_type=jnp.float32)
    var = jnp.dot(jnp.square(x), jnp.square(sp_std),
                  preferred_element_type=jnp.float32)
    std = jnp.sqrt(VAR_EPS + var)
    noise = jax.random.normal(key, mean.shape, jnp.float32)
    out = mean + std * noise
    if bias is not None:
        out = out + bias
    return out


def local_reparam_conv(x, w, sp_std, key, strides, padding, bias=None):
    """Training-mode BBB conv via the local reparametrisation trick.

    Args:
      x: (B, H, W, Cin) NHWC activations.
      w / sp_std: (kh, kw, Cin, Cout) HWIO posterior mean / std.
      strides: (sh, sw). padding: ((pt, pb), (pl, pr)) or 'SAME'/'VALID'.
    """
    dn = ("NHWC", "HWIO", "NHWC")
    mean = lax.conv_general_dilated(x, w, strides, padding,
                                    dimension_numbers=dn)
    var = lax.conv_general_dilated(jnp.square(x), jnp.square(sp_std), strides,
                                   padding, dimension_numbers=dn)
    std = jnp.sqrt(VAR_EPS + var)
    noise = jax.random.normal(key, mean.shape, jnp.float32)
    out = mean + std * noise
    if bias is not None:
        out = out + bias
    return out


def sample_weights(w, sp_std, key):
    """Evaluation-mode BBB weight sampling: w + sp_std * eps.

    One weight draw shared across the whole batch (the reference's eval
    semantics, distinct from per-activation train noise).
    """
    noise = jax.random.normal(key, w.shape, jnp.float32)
    return w + sp_std * noise
