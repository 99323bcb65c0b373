"""Data pipeline: datasets, loaders, distortions, OOD sets, UCI regression.

Functional equivalent of the reference data module (reference: src/data.py)
re-built for a zero-egress TPU host: image datasets are read from local
files in their standard on-disk formats when present, and fall back to
deterministic synthetic stand-ins with identical shapes/statistics so every
pipeline (training, QAT, distortion sweeps, OOD) runs end-to-end without
network access.
"""

from qbn_tpu.data.loaders import (
    ArrayLoader, get_train_loaders, get_test_loader,
)
from qbn_tpu.data.datasets import (
    regression_function, regression_data_generator,
    CIFAR_MEAN, CIFAR_STD, MNIST_MEAN, MNIST_STD,
)
from qbn_tpu.data.distortions import (
    DISTORTIONS, BRIGHTNESS_LEVELS, ROTATION_LEVELS, SHIFT_LEVELS,
    apply_distortion,
)
from qbn_tpu.data.uci import UCIDatasets, UCI_NAMES
