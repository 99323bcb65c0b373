"""Quantisation core: bound tables, observers, fake-quant, BN folding.

Pure-functional equivalents of the reference's torch.quantization usage
(reference: src/quant_utils.py, src/utils.py:18-37).
"""

from qbn_tpu.quant.bounds import UINT_BOUNDS, INT_BOUNDS, uint_bounds, int_bounds
from qbn_tpu.quant.observer import (
    obs_init,
    obs_update,
    calculate_qparams,
)
from qbn_tpu.quant.fake_quant import (
    fake_quantize,
    quantize,
    dequantize,
    requantize,
)
from qbn_tpu.quant.bn_fold import fuse_conv_bn_weights, softplusinv
