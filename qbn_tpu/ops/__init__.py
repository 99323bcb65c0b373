"""Numerical ops: stochastic layer math (XLA reference implementations),
integer inference kernels, and Pallas TPU kernels for the hot paths."""

from qbn_tpu.ops.stochastic import (
    kl_divergence,
    local_reparam_dense,
    local_reparam_conv,
    sample_weights,
)
from qbn_tpu.ops.integer import int_dense, int_conv
