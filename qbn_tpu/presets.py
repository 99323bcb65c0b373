"""Per-(method x tier x phase) hyperparameter presets.

The reference encodes these as argparse defaults across 24 runner scripts
(reference: experiments/scripts/**, e.g. float BBB CIFAR bbb_cifar.py:25-56,
QAT variants quantised/train/*.py:27-79, SGHMC extras sgld_cifar.py:45-50).
Here they are one table keyed by (method, tier) with a QAT overlay.

Tiers: 'regression' (synthetic + UCI MLP), 'mnist' (LeNet),
'cifar' (ResNet-18 w24).
"""

from __future__ import annotations

from typing import Dict

from qbn_tpu.config import Config

_ARCH = {"regression": "linear", "mnist": "conv_lenet",
         "cifar": "conv_resnet"}
_SUFFIX = {"pointwise": "", "mcdropout": "_mc", "bbb": "_bbb",
           "sgld": "_sgld"}
_DATASET = {"regression": "regression_synthetic", "mnist": "mnist",
            "cifar": "cifar"}
_INPUT = {"regression": (1,), "mnist": (28, 28, 1), "cifar": (32, 32, 3)}

# float-phase presets: (lr, epochs, batch, extras)
_FLOAT: Dict[tuple, dict] = {
    ("pointwise", "regression"): dict(learning_rate=1e-3, epochs=300,
                                      batch_size=1000, weight_decay=5e-5,
                                      samples=1),
    ("pointwise", "mnist"): dict(learning_rate=1e-3, epochs=100,
                                 batch_size=256, weight_decay=1e-4,
                                 samples=1),
    ("pointwise", "cifar"): dict(learning_rate=1e-3, epochs=300,
                                 batch_size=256, weight_decay=1e-5,
                                 samples=1),
    ("mcdropout", "regression"): dict(learning_rate=1e-3, epochs=300,
                                      batch_size=1000, p=0.2, samples=20),
    ("mcdropout", "mnist"): dict(learning_rate=1e-3, epochs=100,
                                 batch_size=128, p=0.2, samples=20),
    ("mcdropout", "cifar"): dict(learning_rate=5e-3, epochs=300,
                                 batch_size=256, p=0.15, samples=20),
    ("bbb", "regression"): dict(learning_rate=1e-2, epochs=300,
                                batch_size=1000, gamma=1.0, sigma_prior=1.0,
                                samples=20),
    ("bbb", "mnist"): dict(learning_rate=1e-3, epochs=100, batch_size=256,
                           gamma=0.1, sigma_prior=0.1, samples=20),
    ("bbb", "cifar"): dict(learning_rate=1e-3, epochs=300, batch_size=256,
                           gamma=0.01, sigma_prior=0.05, samples=20),
    # SGLD float runners pass scheduler=None — CONSTANT lr, unlike every
    # other method's CosineAnnealingLR. The SGHMC noise scales with lr,
    # so a leaked cosine decay collapses late-snapshot diversity (measured:
    # OOD entropy 0.24 vs the reference's 0.67 on the parity cell)
    # (reference: sgld/float/sgld_mnist.py:111 scheduler = None).
    ("sgld", "regression"): dict(learning_rate=1e-2, epochs=300,
                                 batch_size=128, optimizer="sghmc",
                                 lr_schedule="constant",
                                 loss_scaling="whole", loss_multiplier=2.0,
                                 burnin_epochs=200,
                                 resample_momentum_iterations=10,
                                 resample_prior_iterations=5, samples=7),
    ("sgld", "mnist"): dict(learning_rate=1e-2, epochs=100, batch_size=256,
                            optimizer="sghmc", lr_schedule="constant",
                            loss_scaling="whole",
                            loss_multiplier=1.0, burnin_epochs=20,
                            resample_momentum_iterations=50,
                            resample_prior_iterations=15, samples=7),
    ("sgld", "cifar"): dict(learning_rate=1e-2, epochs=300, batch_size=256,
                            optimizer="sghmc", lr_schedule="constant",
                            loss_scaling="whole",
                            loss_multiplier=16.0, burnin_epochs=200,
                            resample_momentum_iterations=50,
                            resample_prior_iterations=25, samples=7),
}

# QAT fine-tune overlay (reference: quantised/train/*.py): 10 epochs of
# SGD momentum 0.9 at lr 1e-5 (mcdropout CIFAR uses 1e-3), gamma 0 for BBB,
# default precisions A7 W8; pointwise/sgld CIFAR batch 1024.
_QAT_LR_EXCEPTIONS = {("mcdropout", "cifar"): 1e-3}
_QAT_BATCH_EXCEPTIONS = {("pointwise", "cifar"): 1024, ("sgld", "cifar"): 1024}


def preset(method: str, tier: str, phase: str = "float",
           **overrides) -> Config:
    """Build the Config for one experiment cell.

    phase: 'float' (full float32 training) or 'qat' (quantisation-aware
    fine-tune + int conversion + int evaluation).
    """
    if (method, tier) not in _FLOAT:
        raise KeyError(f"no preset for ({method}, {tier})")
    kw = dict(_FLOAT[(method, tier)])
    kw.update(
        model=_ARCH[tier] + _SUFFIX[method],
        dataset=_DATASET[tier],
        task="regression" if tier == "regression" else "classification",
        input_size=_INPUT[tier],
        output_size=1 if tier == "regression" else 10,
        valid_portion=0.1 if tier != "regression" else 0.2,
    )
    if phase == "qat":
        kw.update(
            optimizer="sgd",
            learning_rate=_QAT_LR_EXCEPTIONS.get((method, tier), 1e-5),
            epochs=10,
            at=True, q=True,
            lr_schedule="cosine",
            # the QAT runner scripts all default to 'batch' scaling with
            # no multiplier, INCLUDING sgld whose float phase uses
            # 'whole' (+multiplier) — those must not leak into the
            # fine-tune (reference: sgld/quantised/train/sgld_mnist.py:32
            # vs sgld/float/sgld_mnist.py:30; a leaked 'whole' scales
            # gradients by the dataset/batch ratio and collapses the
            # snapshot fine-tunes)
            loss_scaling="batch",
            loss_multiplier=1.0,
        )
        if method == "bbb":
            kw["gamma"] = 0.0
        if (method, tier) in _QAT_BATCH_EXCEPTIONS:
            kw["batch_size"] = _QAT_BATCH_EXCEPTIONS[(method, tier)]
    elif phase != "float":
        raise ValueError(f"unknown phase '{phase}'")
    kw.update(overrides)
    return Config(**kw)
