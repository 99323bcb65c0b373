"""Model factory: string names -> architecture + method configuration.

Name grammar matches the reference ModelFactory
(reference: src/models/__init__.py:11-41): '<arch>[_<method>]' with
arch in {linear, conv_lenet, conv_resnet} and method suffix in
{'' (pointwise), '_mc', '_bbb', '_sgld'}.

SGHMC ('sgld') models use the same deterministic templates as pointwise;
their posterior lives in the *ensemble of snapshots*, which this framework
represents as stacked parameter pytrees evaluated under vmap (see
qbn_tpu.evaluation.ensemble) rather than the reference's ModuleList +
round-robin counter (reference: models_sgld.py:216-288).
"""

from __future__ import annotations

import flax.linen as nn

from qbn_tpu.config import Config
from qbn_tpu.models.architectures import MLPNet, LeNet, ResNet
from qbn_tpu.models.layers import QuantConfig

_ARCHS = {
    "linear": MLPNet,
    "conv_lenet": LeNet,
    "conv_resnet": ResNet,
}


def _parse(name: str):
    method = "pointwise"
    arch = name
    for suffix, m in (("_bbb", "bbb"), ("_sgld", "sgld"), ("_mc", "mcdropout")):
        if name.endswith(suffix):
            method = m
            arch = name[: -len(suffix)]
            break
    if arch not in _ARCHS:
        raise NotImplementedError(f"Unknown model '{name}'")
    return arch, method


def build_model(cfg: Config, quantized: bool | None = None) -> nn.Module:
    """Construct the flax module for cfg.model.

    Args:
      cfg: experiment config.
      quantized: override for whether quantisation machinery is attached
        (defaults to cfg.q or cfg.at, mirroring the reference's q/at flags).
    """
    arch, method = _parse(cfg.model)
    if quantized is None:
        quantized = bool(cfg.q or cfg.at)
    quant = QuantConfig(enabled=quantized, a_bits=cfg.activation_precision,
                        w_bits=cfg.weight_precision,
                        tpu_fused=cfg.tpu_fused)
    kwargs = dict(
        output_size=cfg.output_size if arch != "linear" else 1,
        stochastic=(method == "bbb"),
        dropout_p=(cfg.p if method == "mcdropout" else 0.0),
        sigma_prior=cfg.sigma_prior,
        quant=quant,
    )
    return _ARCHS[arch](**kwargs)


class ModelFactory:
    """Reference-compatible facade (reference: src/models/__init__.py:16)."""

    @staticmethod
    def get_model(model: str, input_size, output_size, q, cfg: Config,
                  training_mode: bool = True) -> nn.Module:
        cfg = cfg.replace(model=model, input_size=tuple(input_size),
                          output_size=int(output_size))
        return build_model(cfg, quantized=bool(q))
