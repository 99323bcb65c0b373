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


@jax.custom_vjp
def _lrd_fused(x, w, sp_std, noise):
    from qbn_tpu.ops.pallas.bbb_dense import local_reparam_dense_fused
    return local_reparam_dense_fused(x, w, sp_std, 0, noise=noise)


def _lrd_fused_fwd(x, w, sp_std, noise):
    return _lrd_fused(x, w, sp_std, noise), (x, w, sp_std, noise)


def _lrd_fused_bwd(res, g):
    # out = x@w + sqrt(VAR_EPS + x^2 @ sp^2) * eps
    x, w, sp, noise = res
    var = jnp.dot(jnp.square(x), jnp.square(sp),
                  preferred_element_type=jnp.float32)
    sigma = jnp.sqrt(VAR_EPS + var)
    dvar = g * noise / (2.0 * sigma)
    dx = (jnp.dot(g, w.T, preferred_element_type=jnp.float32)
          + 2.0 * x * jnp.dot(dvar, jnp.square(sp).T,
                              preferred_element_type=jnp.float32))
    dw = jnp.dot(x.T, g, preferred_element_type=jnp.float32)
    dsp = 2.0 * sp * jnp.dot(jnp.square(x).T, dvar,
                             preferred_element_type=jnp.float32)
    return dx, dw, dsp, g * sigma


_lrd_fused.defvjp(_lrd_fused_fwd, _lrd_fused_bwd)


def local_reparam_dense_auto(x, w, sp_std, key, bias=None,
                             fused: bool = False, interpret: bool = False):
    """local_reparam_dense, optionally through the fused Pallas kernel
    (qbn_tpu.ops.pallas.bbb_dense) with a custom VJP.

    The noise is drawn OUTSIDE the kernel with the same jax.random bits as
    the XLA path, so fused and unfused forwards agree numerically; the
    fusion win is the shared activation tile for the mean/variance matmul
    pair. Active only on TPU (or under interpret for tests)."""
    on_tpu = jax.devices()[0].platform == "tpu"
    if fused and (on_tpu or interpret) and x.ndim == 2:
        noise = jax.random.normal(key, (x.shape[0], w.shape[1]),
                                  jnp.float32)
        if interpret:
            from qbn_tpu.ops.pallas.bbb_dense import \
                local_reparam_dense_fused
            out = local_reparam_dense_fused(x, w, sp_std, 0, noise=noise,
                                            interpret=True)
        else:
            out = _lrd_fused(x, w, sp_std, noise)
        return out + bias if bias is not None else out
    return local_reparam_dense(x, w, sp_std, key, bias)


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
