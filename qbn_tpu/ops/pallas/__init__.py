"""Pallas TPU kernels for the hot inner loops.

These fuse the operation chains the XLA path executes as separate
elementwise passes (posterior weight sampling: on-chip PRNG -> noise
quantisation -> quantised multiply/add -> sub-8-bit clamp; local-reparam
dense: mean/var matmuls sharing the activation tile + noise injection).
Every kernel has a pure-XLA reference implementation as its correctness
oracle (qbn_tpu.ops.stochastic / qbn_tpu.models.layers int paths) and is
validated against it in tests (interpret mode on CPU, compiled on TPU).
"""

from qbn_tpu.ops.pallas.sample_weights import sample_weights_int8
from qbn_tpu.ops.pallas.bbb_dense import local_reparam_dense_fused
