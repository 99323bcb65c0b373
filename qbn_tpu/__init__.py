"""qbn_tpu — a TPU-native framework for quantised Bayesian neural networks.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
martinferianc/quantised-bayesian-nets (arXiv:2102.11062): three Bayesian
inference methods (Bayes-by-backprop, MC-Dropout, SGHMC ensembles) plus a
pointwise baseline, across three task tiers (synthetic/UCI regression MLP,
MNIST LeNet, CIFAR-10 ResNet-18), each trainable in float32 and in
quantisation-aware-trained INT form with sweepable weight (8..2-bit) and
activation (7..2-bit) precisions, evaluated for uncertainty quality (NLL,
ECE, predictive entropy, Brier, error/RMSE) under in-distribution,
out-of-distribution and distortion-shifted test data.

Design stance (TPU-first, not a port):
  * models are pure functions over explicit pytrees (flax.linen with
    'params' / 'batch_stats' / 'quant' / 'qconst' collections);
  * quantisation is a functional transform (observer state carried like BN
    stats; conversion produces an int8 'qconst' collection), not module
    swapping;
  * the Monte-Carlo sample axis is a vmapped/sharded on-chip axis, not a
    Python loop;
  * SGHMC ensembles are stacked parameter pytrees evaluated with vmap;
  * hot inner loops (sample + fake-quant + matmul) are Pallas TPU kernels
    with XLA reference implementations as correctness oracles;
  * multi-chip scaling is jax.sharding Mesh + jit sharding annotations.
"""

__version__ = "0.1.0"
