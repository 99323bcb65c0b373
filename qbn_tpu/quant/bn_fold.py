"""BatchNorm folding, including the BBB posterior-std co-fold.

Folding a BatchNorm into a preceding (stochastic) convolution rescales both
the posterior mean weights AND the pre-softplus posterior std parameter so
that softplus(std') = softplus(std) * gamma / sqrt(var + eps)
(reference: src/models/stochastic/bbb/conv.py:70-80).

Weight layout convention here is flax/TPU NHWC: conv kernels are
(kh, kw, cin, cout) so the per-output-channel factor broadcasts on the last
axis (the reference uses torch's (cout, cin, kh, kw) and broadcasts on the
first).
"""

from __future__ import annotations

import jax.numpy as jnp


def softplus(x):
    return jnp.logaddexp(x, 0.0)


def softplusinv(x):
    """Inverse of softplus: log(exp(x) - 1) (reference: utils_bbb.py:7-8)."""
    # Numerically stable form: x + log1p(-exp(-x)).
    return x + jnp.log(-jnp.expm1(-x))


def fuse_conv_bn_weights(conv_w, conv_b, conv_std, bn_rm, bn_rv, bn_eps,
                         bn_w, bn_b):
    """Fold BN statistics into conv weight, bias and (optionally) BBB std.

    Args:
      conv_w: (kh, kw, cin, cout) conv kernel (posterior mean for BBB).
      conv_b: (cout,) bias or None.
      conv_std: (kh, kw, cin, cout) pre-softplus posterior std or None.
      bn_rm / bn_rv: BN running mean / variance (cout,).
      bn_eps: BN epsilon.
      bn_w / bn_b: BN scale (gamma) / shift (beta) (cout,).

    Returns (folded_w, folded_b, folded_std) with folded_std None when
    conv_std is None.
    """
    if conv_b is None:
        conv_b = jnp.zeros_like(bn_rm)
    rstd = 1.0 / jnp.sqrt(bn_rv + bn_eps)
    c = bn_w * rstd  # (cout,) — broadcasts over the last kernel axis
    folded_w = conv_w * c
    folded_std = None
    if conv_std is not None:
        folded_std = softplusinv(softplus(conv_std) * c)
    folded_b = (conv_b - bn_rm) * rstd * bn_w + bn_b
    return folded_w, folded_b, folded_std
