"""The three reference architectures, parametrised by inference method.

One definition per architecture serves all four method families — the
method only toggles `stochastic` (Bayes-by-backprop layers) and `dropout_p`
(always-on MC-Dropout) — instead of the reference's four parallel model
files (reference: src/models/{pointwise/models_p.py,
stochastic/{bbb/models_bbb.py, mcdropout/models_mc.py,
sgld/models_sgld.py}}).

Architectures (reference README.md:27-41):
  * MLPNet: in -> 100 -> 100 -> 100 (ReLU) -> {mu, log_var} heads,
    returns (mu, exp(log_var)).
  * LeNet: conv(20,5x5,pad2) -> maxpool2 -> conv(50) -> maxpool2 -> flatten
    -> fc500+ReLU -> fc_out -> softmax (convs have no ReLU/BN).
  * ResNet-18 at widths 24/48/96/192, stages [2,2,2,2], strides 1/2/2/2,
    avgpool4, fc_out, softmax (note: width 24 base, not the canonical 64).

Data layout is NHWC (TPU-native); all classification nets return softmax
probabilities, regression nets return (mu, var).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from qbn_tpu.models.layers import (
    QuantConfig, QTensor, MergedQTensor, PackedQTensor, DenseBlock,
    ConvBlock, BernoulliDropout, ResidualAdd, InputQuant, dequant,
    max_pool, avg_pool, flatten, fused_resadd_enabled,
)


class MLPNet(nn.Module):
    """Regression MLP with mean/log-variance heads."""
    output_size: int = 1
    hidden: Sequence[int] = (100, 100, 100)
    stochastic: bool = False
    dropout_p: float = 0.0
    sigma_prior: float = 1.0
    quant: QuantConfig = QuantConfig()

    @nn.compact
    def __call__(self, x, *, train: bool = False, mode: str = "float",
                 update_stats: bool = False):
        kw = dict(train=train, mode=mode, update_stats=update_stats)
        dkw = dict(mode=mode, update_stats=update_stats)
        x = flatten(x) if not isinstance(x, QTensor) and x.ndim > 2 else x
        x = InputQuant(self.quant, name="input_quant")(x, **dkw)
        for i, h in enumerate(self.hidden):
            x = DenseBlock(h, use_bias=True, stochastic=self.stochastic,
                           relu=True, sigma_prior=self.sigma_prior,
                           std_init=-3.0, quant=self.quant,
                           name=f"dense_{i}")(x, **kw)
            if self.dropout_p > 0 and i != len(self.hidden) - 1:
                x = BernoulliDropout(self.dropout_p, self.quant,
                                     name=f"drop_{i}")(x, **kw)
        mu_in = lv_in = x
        if self.dropout_p > 0:
            mu_in = BernoulliDropout(self.dropout_p, self.quant,
                                     name="drop_mu")(x, **kw)
            lv_in = BernoulliDropout(self.dropout_p, self.quant,
                                     name="drop_log_var")(x, **kw)
        mu = DenseBlock(self.output_size, use_bias=True,
                        stochastic=self.stochastic,
                        sigma_prior=self.sigma_prior, std_init=-3.0,
                        quant=self.quant, name="mu")(mu_in, **kw)
        log_var = DenseBlock(self.output_size, use_bias=True,
                             stochastic=self.stochastic,
                             sigma_prior=self.sigma_prior, std_init=-3.0,
                             quant=self.quant, name="log_var")(lv_in, **kw)
        return dequant(mu), jnp.exp(dequant(log_var))


class LeNet(nn.Module):
    """MNIST LeNet-style conv net."""
    output_size: int = 10
    stochastic: bool = False
    dropout_p: float = 0.0
    sigma_prior: float = 1.0
    quant: QuantConfig = QuantConfig()

    @nn.compact
    def __call__(self, x, *, train: bool = False, mode: str = "float",
                 update_stats: bool = False):
        kw = dict(train=train, mode=mode, update_stats=update_stats)
        dkw = dict(mode=mode, update_stats=update_stats)
        x = InputQuant(self.quant, name="input_quant")(x, **dkw)
        x = ConvBlock(20, (5, 5), (1, 1), padding=2, use_bias=False,
                      stochastic=self.stochastic,
                      sigma_prior=self.sigma_prior, std_init=-10.0,
                      quant=self.quant, name="conv_0")(x, **kw)
        if self.dropout_p > 0:
            x = BernoulliDropout(self.dropout_p, self.quant,
                                 name="drop_0")(x, **kw)
        x = max_pool(x, 2, 2)
        x = ConvBlock(50, (5, 5), (1, 1), padding=2, use_bias=False,
                      stochastic=self.stochastic,
                      sigma_prior=self.sigma_prior, std_init=-10.0,
                      quant=self.quant, name="conv_1")(x, **kw)
        if self.dropout_p > 0:
            x = BernoulliDropout(self.dropout_p, self.quant,
                                 name="drop_1")(x, **kw)
        x = max_pool(x, 2, 2)
        x = flatten(x)
        x = DenseBlock(500, use_bias=False, stochastic=self.stochastic,
                       relu=True, sigma_prior=self.sigma_prior,
                       std_init=-3.0, quant=self.quant,
                       name="fc_0")(x, **kw)
        if self.dropout_p > 0:
            x = BernoulliDropout(self.dropout_p, self.quant,
                                 name="drop_2")(x, **kw)
        x = DenseBlock(self.output_size, use_bias=False,
                       stochastic=self.stochastic,
                       sigma_prior=self.sigma_prior, std_init=-3.0,
                       quant=self.quant, name="fc_1")(x, **kw)
        x = dequant(x)
        return jax.nn.softmax(x, axis=-1)


class BasicBlock(nn.Module):
    """ResNet basic block (two 3x3 conv+BN, optional 1x1 shortcut)."""
    planes: int
    stride: int = 1
    stochastic: bool = False
    dropout_p: float = 0.0
    sigma_prior: float = 1.0
    quant: QuantConfig = QuantConfig()

    @nn.compact
    def __call__(self, x, *, train: bool = False, mode: str = "float",
                 update_stats: bool = False):
        kw = dict(train=train, mode=mode, update_stats=update_stats)
        if isinstance(x, PackedQTensor):
            cin = x.channels                     # packed (B,hb,wb,S*4*cin)
        elif isinstance(x, MergedQTensor):
            cin = x.codes.shape[-1] // x.s       # merged (B, H, W, S*cin)
        elif isinstance(x, QTensor):
            cin = x.codes.shape[-1]
        else:
            cin = x.shape[-1]
        out = ConvBlock(self.planes, (3, 3), (self.stride, self.stride),
                        padding=1, bn=True, relu=True,
                        stochastic=self.stochastic,
                        sigma_prior=self.sigma_prior, std_init=-10.0,
                        quant=self.quant, name="conv_bn_relu")(x, **kw)
        if self.dropout_p > 0:
            out = BernoulliDropout(self.dropout_p, self.quant,
                                   name="drop_0")(out, **kw)
        # int+merged: defer conv_bn's requant so ResidualAdd+relu run
        # inside its conv epilogue (no HBM round-trip of the conv's int8
        # output; qbn_tpu.models.layers.DeferredMergedConv). Dropout
        # between conv and add needs materialised codes, so no deferral.
        defer = (mode == "int" and self.dropout_p == 0
                 and fused_resadd_enabled())
        out = ConvBlock(self.planes, (3, 3), (1, 1), padding=1, bn=True,
                        stochastic=self.stochastic,
                        sigma_prior=self.sigma_prior, std_init=-10.0,
                        quant=self.quant, name="conv_bn")(
                            out, defer_residual=defer, **kw)
        if self.dropout_p > 0:
            out = BernoulliDropout(self.dropout_p, self.quant,
                                   name="drop_1")(out, **kw)
        shortcut = x
        if self.stride != 1 or cin != self.planes:
            shortcut = ConvBlock(self.planes, (1, 1),
                                 (self.stride, self.stride), padding=0,
                                 bn=True, stochastic=self.stochastic,
                                 sigma_prior=self.sigma_prior,
                                 std_init=-10.0, quant=self.quant,
                                 name="shortcut")(x, **kw)
            if self.dropout_p > 0:
                shortcut = BernoulliDropout(self.dropout_p, self.quant,
                                            name="drop_sc")(shortcut, **kw)
        return ResidualAdd(self.quant, relu=True, name="add")(
            out, shortcut, mode=mode, update_stats=update_stats)


class ResNet(nn.Module):
    """CIFAR ResNet-18 at widths 24/48/96/192 (reference width choice)."""
    output_size: int = 10
    widths: Sequence[int] = (24, 48, 96, 192)
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    strides: Sequence[int] = (1, 2, 2, 2)
    stochastic: bool = False
    dropout_p: float = 0.0
    sigma_prior: float = 1.0
    quant: QuantConfig = QuantConfig()

    @nn.compact
    def __call__(self, x, *, train: bool = False, mode: str = "float",
                 update_stats: bool = False, up_to: str = None):
        kw = dict(train=train, mode=mode, update_stats=update_stats)
        dkw = dict(mode=mode, update_stats=update_stats)
        x = InputQuant(self.quant, name="input_quant")(x, **dkw)
        # Stage-resident s2d (qbn_tpu.ops.s2d_merged): the stem emits
        # (up_to: benchmarking-only truncation point — 'stem',
        # 'stage0'..'stage3', 'pool' return the intermediate there so
        # tools/microbench_stages.py can attribute wall time)
        # the phi packing directly in int+merged mode, the width-24
        # stage runs packed (24/128 -> 96/128 MXU lanes), and the stage
        # exit unpacks once. Only legal when stage 0 is all stride-1
        # same-width blocks with no dropout between convs.
        pack_stage0 = (self.dropout_p == 0 and self.strides[0] == 1)
        x = ConvBlock(self.widths[0], (3, 3), (1, 1), padding=1, bn=True,
                      relu=True, stochastic=self.stochastic,
                      sigma_prior=self.sigma_prior, std_init=-10.0,
                      quant=self.quant, name="stem",
                      s2d_pack_output=pack_stage0)(x, **kw)
        if self.dropout_p > 0:
            x = BernoulliDropout(self.dropout_p, self.quant,
                                 name="drop_stem")(x, **kw)
        if up_to == "stem":
            return x
        for s, (planes, blocks, stride) in enumerate(
                zip(self.widths, self.num_blocks, self.strides)):
            if isinstance(x, PackedQTensor) and (planes != self.widths[0]
                                                 or stride != 1):
                from qbn_tpu.ops.s2d_merged import unpack_phi
                assert x.parity == "phi"
                x = MergedQTensor(unpack_phi(x.codes, x.s), x.scale,
                                  x.zp, s=x.s)
            for b in range(blocks):
                x = BasicBlock(planes, stride if b == 0 else 1,
                               stochastic=self.stochastic,
                               dropout_p=self.dropout_p,
                               sigma_prior=self.sigma_prior,
                               quant=self.quant,
                               name=f"stage{s}_block{b}")(x, **kw)
            if up_to == f"stage{s}":
                return x
        if isinstance(x, PackedQTensor):
            from qbn_tpu.ops.s2d_merged import unpack_phi
            assert x.parity == "phi"
            x = MergedQTensor(unpack_phi(x.codes, x.s), x.scale, x.zp,
                              s=x.s)
        x = avg_pool(x, 4)
        x = flatten(x)
        if up_to == "pool":
            return x
        x = DenseBlock(self.output_size, use_bias=False,
                       stochastic=self.stochastic,
                       sigma_prior=self.sigma_prior, std_init=-3.0,
                       quant=self.quant, name="fc")(x, **kw)
        x = dequant(x)
        return jax.nn.softmax(x, axis=-1)
