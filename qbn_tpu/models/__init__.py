"""Model zoo: one quantisation-aware stochastic layer library serving four
method families (pointwise / MC-Dropout / Bayes-by-backprop / SGHMC) across
three architectures (regression MLP, MNIST LeNet, CIFAR ResNet-18)."""

from qbn_tpu.models.factory import ModelFactory, build_model
from qbn_tpu.models.layers import QuantConfig, QTensor
