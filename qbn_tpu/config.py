"""Experiment configuration: one dataclass replacing the reference's argparse
namespace that is threaded through models, losses and clamps
(reference: src/utils.py:154-224 and the 24 runner scripts' flag sets).

Field defaults follow the float BBB CIFAR runner; per-(method x dataset)
presets live in qbn_tpu.presets.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class Config:
    # Task / model selection
    task: str = "classification"          # classification | regression
    model: str = "conv_resnet_bbb"        # <arch>[_<method>] (see ModelFactory)
    dataset: str = "cifar"                # mnist|cifar|regression_*|random_*

    # Optimisation
    learning_rate: float = 1e-3
    loss_scaling: str = "batch"           # 'whole' | 'batch'
    loss_multiplier: float = 1.0
    weight_decay: float = 0.0
    epochs: int = 300
    batch_size: int = 256
    gamma: float = 0.01                   # KL weight
    optimizer: str = "adam"               # adam | sgd | sghmc
    momentum: float = 0.9                 # for sgd (QAT fine-tune)
    lr_schedule: str = "cosine"           # cosine | constant

    # Bayesian knobs
    sigma_prior: float = 0.05             # BBB prior std
    p: float = 0.2                        # MC-dropout rate
    samples: int = 20                     # MC samples at eval / ensemble size

    # SGHMC (reference: sgld_cifar.py:45-50)
    burnin_epochs: int = 200
    resample_momentum_iterations: int = 50
    resample_prior_iterations: int = 25
    gauss_sig: float = 0.1
    base_c: float = 0.05
    alpha0: float = 10.0
    beta0: float = 10.0
    # Snapshot divergence guard (framework EXTRA, no reference analogue —
    # default 0.0 keeps reference-faithful behaviour): when > 0, a
    # posterior snapshot is SKIPPED while the epoch's validation key
    # metric exceeds best-so-far + sghmc_guard, so a chain that hops to
    # a bad mode late (observed twice in the round-3 campaign/parity
    # runs: train error 0.002 -> 0.9 at epoch 90/100) cannot fill the
    # ensemble with diverged members. The guard never adds snapshots; a
    # chain diverged for the whole window yields a smaller ensemble.
    sghmc_guard: float = 0.0

    # Data
    data: str = "./data"
    valid_portion: float = 0.1
    input_size: Tuple[int, ...] = (32, 32, 3)   # NHWC (TPU-native layout)
    output_size: int = 10

    # Quantisation
    q: bool = False                       # converted-int inference
    at: bool = False                      # quantisation-aware training
    activation_precision: int = 7         # bits, 2..7 (uint)
    weight_precision: int = 8             # bits, 2..8 (int)

    # Bookkeeping
    seed: int = 1
    debug: bool = False                   # break every loop after one batch
    debug_nans: bool = False              # raise on first NaN inside jit
    profile: bool = False                 # write a jax.profiler trace
    save: str = "EXP"
    load: Optional[str] = None
    save_last: bool = True
    report_freq: int = 50

    # Parallelism / TPU kernels (TPU additions; no reference equivalent)
    mesh_shape: Optional[Tuple[int, ...]] = None   # None = single-device
    mc_parallel: int = 1                  # MC-sample axis sharding factor
    tpu_fused: bool = False               # fused Pallas local-reparam dense

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def method(self) -> str:
        """Inference method encoded in the model name suffix."""
        for m in ("bbb", "sgld", "mc"):
            if self.model.endswith("_" + m) or m in self.model.split("_"):
                return {"mc": "mcdropout"}.get(m, m)
        return "pointwise"

    @property
    def arch(self) -> str:
        """Architecture family: linear | conv_lenet | conv_resnet."""
        name = self.model
        for suffix in ("_bbb", "_sgld", "_mc"):
            if name.endswith(suffix):
                name = name[: -len(suffix)]
        return name
