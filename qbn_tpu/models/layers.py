"""Quantisation-aware stochastic layer library (flax.linen, NHWC).

One layer implementation serves every (method x precision) cell of the
reference's grid. Instead of the reference's PyTorch module swapping
(float module -> QAT module -> quantised module,
reference: src/quant_utils.py:39-60), each block here implements four
*call-time* modes over one variable tree:

  mode='float'    float32 forward (reference float modules).
  mode='qat'      fake-quantised forward with observer state in the 'quant'
                  collection (reference *_qat modules).
  mode='convert'  qat-eval forward that additionally writes the integer
                  constants ('qconst' collection): int8 weight/std codes,
                  scales, zero points, folded BN (reference convert() +
                  from_float()).
  mode='int'      integer inference over QTensor activation codes
                  (reference *_q modules on FBGEMM, here int8 MXU dots).

Observer state lives in 'quant' (like BN stats live in 'batch_stats'), so
quantisation is a functional transform over pytrees — vmap/pjit-compatible.

Stochastic (Bayes-by-backprop) blocks follow the reference semantics:
training uses the local reparametrisation trick (per-activation noise);
evaluation samples one weight per forward shared across the batch
(reference: bbb/linear.py:30-52). KL divergences are sow'n into the
'kl' collection.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from qbn_tpu.ops.stochastic import (
    kl_divergence, local_reparam_dense, local_reparam_dense_auto,
    local_reparam_conv, sample_weights, softplus,
)
from qbn_tpu.ops.integer import int_dense, int_conv
from qbn_tpu.quant.bounds import (
    UINT_BOUNDS, INT_BOUNDS, NOISE_SCALE, NOISE_ZERO_POINT,
)
from qbn_tpu.quant.observer import obs_init, obs_update, calculate_qparams
from qbn_tpu.quant.fake_quant import (
    fake_quantize, quantize, dequantize, quantized_add, quantized_mul,
)

MODES = ("float", "qat", "convert", "int")


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Static quantisation configuration (hashable: safe as a linen field).

    tpu_fused additionally routes the BBB local-reparam dense through the
    fused Pallas kernel on TPU (Config.tpu_fused)."""
    enabled: bool = False
    a_bits: int = 7
    w_bits: int = 8
    tpu_fused: bool = False

    @property
    def a_bounds(self) -> Tuple[int, int]:
        return UINT_BOUNDS[self.a_bits]

    @property
    def w_bounds(self) -> Tuple[int, int]:
        return INT_BOUNDS[self.w_bits]


@flax.struct.dataclass
class QTensor:
    """Quantised activation: ZERO-POINT-REMOVED int8 codes + qparams.

    codes = q - zp where q is the uint8-convention code with zero point zp.
    dequant = codes * scale. This fits int8 exactly because activation
    precision is capped at 7 bits (reference: src/quant_utils.py:120), so
    q, zp in [0, 127]. Zero-point removal keeps every activation int8 on
    the wire AND makes the int8 MXU dense/conv a single pass with no
    activation-side zero-point corrections — conv zero padding becomes
    exactly FBGEMM's pad-with-zero-point semantics (see qbn_tpu.ops.integer).
    """
    codes: jax.Array   # int8, zero-point-removed codes (q - zp)
    scale: jax.Array   # f32 scalar
    zp: jax.Array      # int32 scalar (uint8 convention)


@flax.struct.dataclass
class MergedQTensor:
    """Quantised activations for ALL posterior samples in MERGED layout.

    The transpose-free INT MC-evaluation representation: conv activations
    are (B, H, W, S*C) int8 codes (sample-major channel groups), dense
    activations (B, S, F). One per-layer scale/zp serves every sample
    (observers are shared). Produced by the first stochastic block when
    its presampled weights carry a leading sample axis; consumed by
    feature-grouped convs / batched dense that preserve the layout
    (qbn_tpu.ops.integer.int_conv_merged / int_dense_merged) — the int8
    sample-axis transpose of the vmapped path never materialises.
    """
    codes: jax.Array   # int8, zero-point-removed codes
    scale: jax.Array   # f32 scalar
    zp: jax.Array      # int32 scalar
    s: int = flax.struct.field(pytree_node=False, default=1)


@flax.struct.dataclass
class PackedQTensor:
    """Merged-layout activations in the stage-resident space-to-depth
    packing (qbn_tpu.ops.s2d_merged): codes (B, hb, wb, S*4*C) int8 with
    2x2 spatial blocks folded into channels, parity 'phi' (block = rows
    2b,2b+1) or 'psi' (block = rows 2a-1,2a; one extra block of
    zero-masked out-of-image border). Lifts the width-24 stage's MXU
    lane occupancy from 24/128 to 96/128; convs alternate the parity so
    no re-blocking transpose ever runs."""
    codes: jax.Array
    scale: jax.Array
    zp: jax.Array
    s: int = flax.struct.field(pytree_node=False, default=1)
    parity: str = flax.struct.field(pytree_node=False, default="phi")

    @property
    def channels(self) -> int:
        return self.codes.shape[-1] // (4 * self.s)


def s2d_merged_enabled() -> bool:
    """Stage-resident packed INT path (default OFF; QBN_S2D_MERGED=on
    enables). Measured SLOWER than the native-view merged conv on TPU
    v5e (tools/microbench_s2dm.py: st1 1.31+1.16 ms packed pair vs
    1.00 ms unpacked; st2 0.75 vs 0.46 ms) — the native-view requant
    epilogues already lift the unpacked formulation to 54-119
    useful-TOPS, and the packed 2x2 block-space conv's 16/9 MAC
    overhead plus its 17^2 psi grid tile poorly. Kept as a
    bitwise-exact library (tests/test_s2d_merged.py)."""
    import os
    return os.environ.get("QBN_S2D_MERGED", "off") == "on"


class DeferredMergedConv:
    """Handoff from ConvBlock to ResidualAdd in the int+merged path: the
    conv's int_conv_merged call, NOT yet issued, so the residual add can
    run fused inside the conv's requant epilogue (ops.integer
    int_conv_merged residual args). Plain trace-local object — never
    crosses a jit boundary."""

    def __init__(self, kwargs: dict, s: int, scale, zp):
        self.kwargs = kwargs      # full int_conv_merged argument dict
        self.s = s
        self.scale = scale        # the conv's own act observer grid
        self.zp = zp


def fused_resadd_enabled() -> bool:
    """Residual add fused into the producing conv's requant epilogue
    (default OFF; QBN_FUSED_RESADD=on enables). Measured PERF-NEUTRAL
    on TPU v5e (headline bench 363.5k fused vs 366.3k unfused
    ex-samples/s, within run noise): the native-view epilogue work
    already reduced the standalone add+relu kernels to near-zero
    marginal cost (the 365k headline ~= the 367.9k remove-all-adds
    ablation). Kept wired for parity with FBGEMM's fused add_relu and
    for shapes where the add's HBM round-trip matters."""
    import os
    return os.environ.get("QBN_FUSED_RESADD", "off") == "on"


def quantize_codes(x, scale, zp, a_lo: int, a_hi: int):
    """Float -> zero-point-removed int8 codes clamped to the sub-8-bit
    bounds."""
    q = quantize(x, scale, zp, a_lo, a_hi, dtype=jnp.int32)
    return (q - zp).astype(jnp.int8)


def dequantize_codes(codes, scale):
    return codes.astype(jnp.float32) * scale


def _torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear/Conv2d default init: U(-1/sqrt(fan_in), +)."""
    fan_in = shape[0] if len(shape) == 2 else shape[0] * shape[1] * shape[2]
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bbb_weight_init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -0.01, 0.01)


def _torch_bias_init(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in of the weight), +)."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / float(fan_in) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class QuantOps:
    """Mixin: observer-backed fake-quant helpers for linen modules.

    (No dataclass fields here — subclasses declare their own `quant`.)
    """

    def _obs(self, name: str):
        return self.variable("quant", name, obs_init)

    def _fq(self, name: str, x, bounds, update: bool):
        """Observe x (optionally) and fake-quantise it with the observer's
        current qparams (torch FakeQuantize-with-observer semantics)."""
        v = self._obs(name)
        if update and not self.is_initializing():
            v.value = obs_update(v.value, x)
        scale, zp = calculate_qparams(
            v.value["min_val"], v.value["max_val"], bounds[0], bounds[1])
        return fake_quantize(x, scale, zp, bounds[0], bounds[1])

    def _qparams(self, name: str, bounds):
        # Read-only access (the observer was declared earlier in this call
        # by _fq; self.variable would raise NameInUse on re-declaration).
        state = self.get_variable("quant", name, None)
        if state is None:
            state = obs_init()
        return calculate_qparams(
            state["min_val"], state["max_val"], bounds[0], bounds[1])


def _qc_placeholder(shapes):
    """Zero-filled qconst placeholder with the right tree structure."""
    out = {}
    for k, v in shapes.items():
        if v == "scalar_f":
            out[k] = jnp.ones((), jnp.float32)
        elif v == "scalar_i":
            out[k] = jnp.zeros((), jnp.int32)
        else:
            out[k] = jnp.zeros(v, jnp.int8)
    return out


class DenseBlock(nn.Module, QuantOps):
    """Dense layer + optional fused ReLU, pointwise or Bayes-by-backprop.

    Covers the reference's nn.Linear / bbb.Linear / (QAT)Linear(ReLU) /
    QuantizedLinear(ReLU) family in one module
    (reference: src/models/stochastic/bbb/linear.py, quantized/linear_qat.py,
    quantized/linear_q.py).
    """
    features: int
    use_bias: bool = True
    stochastic: bool = False
    relu: bool = False
    sigma_prior: float = 1.0
    std_init: float = -3.0
    quant: QuantConfig = QuantConfig()

    @nn.compact
    def __call__(self, x, *, train: bool = False, mode: str = "float",
                 update_stats: bool = False):
        assert mode in MODES
        q = self.quant
        if isinstance(x, MergedQTensor):
            in_features = x.codes.shape[-1]       # (B, S, F) dense layout
        elif isinstance(x, QTensor):
            in_features = x.codes.shape[-1]
        else:
            in_features = x.shape[-1]
        w_init = _bbb_weight_init if self.stochastic else _torch_linear_init
        kernel = self.param("kernel", w_init, (in_features, self.features))
        std = (self.param("std", nn.initializers.constant(self.std_init),
                          (in_features, self.features))
               if self.stochastic else None)
        b_init = (_bbb_weight_init if self.stochastic
                  else _torch_bias_init(in_features))
        bias = (self.param("bias", b_init, (self.features,))
                if self.use_bias else None)

        if self.stochastic:
            # KL against the zero-mean sigma_prior Gaussian prior.
            self.sow("kl", "kl",
                     kl_divergence(kernel, softplus(std),
                                   jnp.zeros_like(kernel),
                                   jnp.full_like(std, self.sigma_prior)),
                     reduce_fn=lambda a, b: b)

        qc = None
        if q.enabled:
            qc = self.variable(
                "qconst", "q",
                lambda: _qc_placeholder({
                    "w_codes": kernel.shape, "std_codes": kernel.shape,
                    "w_scale": "scalar_f", "w_zp": "scalar_i",
                    "std_scale": "scalar_f", "std_zp": "scalar_i",
                    "mul_scale": "scalar_f", "mul_zp": "scalar_i",
                    "add_scale": "scalar_f", "add_zp": "scalar_i",
                    "act_scale": "scalar_f", "act_zp": "scalar_i",
                }) | {"is_stoch": jnp.asarray(int(self.stochastic),
                                              jnp.int32),
                      "w_lo": jnp.asarray(q.w_bounds[0], jnp.int32),
                      "w_hi": jnp.asarray(q.w_bounds[1], jnp.int32)})

        if mode == "int":
            return self._int_forward(x, qc.value, bias)

        if mode == "float":
            y = self._float_forward(x, kernel, std, bias, train)
        else:  # qat / convert
            y = self._qat_forward(x, kernel, std, bias, train, update_stats)
            if self.relu:
                y = jax.nn.relu(y)
            y = self._fq("act", y, q.a_bounds, update_stats)
            if mode == "convert":
                self._write_qconst(qc, kernel, std, bias)
            return y

        if self.relu:
            y = jax.nn.relu(y)
        return y

    # -- float -------------------------------------------------------------
    def _float_forward(self, x, kernel, std, bias, train):
        if not self.stochastic:
            y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
            return y + bias if bias is not None else y
        if train:
            return local_reparam_dense_auto(
                x, kernel, softplus(std), self.make_rng("noise"), bias,
                fused=self.quant.tpu_fused)
        w = sample_weights(kernel, softplus(std), self.make_rng("noise"))
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return y + bias if bias is not None else y

    # -- qat ---------------------------------------------------------------
    def _qat_forward(self, x, kernel, std, bias, train, update):
        wb = self.quant.w_bounds
        w_fq = self._fq("weight", kernel, wb, update)
        if not self.stochastic:
            y = jnp.dot(x, w_fq, preferred_element_type=jnp.float32)
            return y + bias if bias is not None else y
        std_fq = self._fq("std_w", softplus(std), wb, update)
        if train:
            return local_reparam_dense_auto(
                x, w_fq, std_fq, self.make_rng("noise"), bias,
                fused=self.quant.tpu_fused)
        # eval: weight-space sampling with observed mul/add (FloatFunctional
        # observer pattern, reference: linear_qat.py:31-37)
        noise = jax.random.normal(self.make_rng("noise"), kernel.shape,
                                  jnp.float32)
        prod = self._fq("mul_noise", noise * std_fq, wb, update)
        w_s = self._fq("add_weight", w_fq + prod, wb, update)
        y = jnp.dot(x, w_s, preferred_element_type=jnp.float32)
        return y + bias if bias is not None else y

    # -- convert -----------------------------------------------------------
    def _write_qconst(self, qc, kernel, std, bias):
        if self.is_initializing():
            return
        wb, ab = self.quant.w_bounds, self.quant.a_bounds
        ws, wz = self._qparams("weight", wb)
        entry = dict(qc.value)
        entry["w_codes"] = quantize(kernel, ws, wz, wb[0], wb[1])
        entry["w_scale"], entry["w_zp"] = ws, wz
        if self.stochastic:
            ss, sz = self._qparams("std_w", wb)
            entry["std_codes"] = quantize(softplus(std), ss, sz, wb[0], wb[1])
            entry["std_scale"], entry["std_zp"] = ss, sz
            ms, mz = self._qparams("mul_noise", wb)
            entry["mul_scale"], entry["mul_zp"] = ms, mz
            as_, az = self._qparams("add_weight", wb)
            entry["add_scale"], entry["add_zp"] = as_, az
        acts, actz = self._qparams("act", ab)
        entry["act_scale"], entry["act_zp"] = acts, actz
        qc.value = entry

    # -- int ---------------------------------------------------------------
    def _int_forward(self, x, qc, bias):
        q = self.quant
        wb, ab = q.w_bounds, q.a_bounds
        presampled = self.get_variable("sampled", "w", None)
        if (self.stochastic and presampled is not None
                and presampled.ndim == 3):
            # MERGED layout: presampled weights carry the full sample axis
            # (S, F, O) — one batched GEMM computes every sample, layout-
            # preserving (MergedQTensor; ops.integer.int_dense_merged)
            from qbn_tpu.ops.integer import int_dense_merged
            s = presampled.shape[0]
            codes = int_dense_merged(
                x.codes, x.scale, presampled, qc["add_scale"],
                qc["add_zp"], bias, qc["act_scale"], qc["act_zp"],
                ab[0], ab[1], relu=self.relu,
                shared_x=isinstance(x, QTensor))
            return MergedQTensor(codes, qc["act_scale"], qc["act_zp"], s=s)
        if isinstance(x, MergedQTensor):
            # merged activations through a deterministic dense: broadcast
            # the shared weights over the sample groups
            from qbn_tpu.ops.integer import int_dense_merged
            w8 = qc["w_codes"].astype(jnp.int8)
            codes = int_dense_merged(
                x.codes, x.scale,
                jnp.broadcast_to(w8, (x.s,) + w8.shape),
                qc["w_scale"], qc["w_zp"], bias, qc["act_scale"],
                qc["act_zp"], ab[0], ab[1], relu=self.relu)
            return MergedQTensor(codes, qc["act_scale"], qc["act_zp"],
                                 s=x.s)
        if self.stochastic and presampled is not None:
            # weights for this MC sample were drawn up-front (one fused
            # Pallas kernel over all samples, see evaluation.mc.presample)
            w_codes = presampled.astype(jnp.int32)
            w_scale, w_zp = qc["add_scale"], qc["add_zp"]
        elif self.stochastic:
            # fp32 noise quantised at the fixed 3/127 scale, multiplied and
            # added in the integer domain (reference: linear_q.py:82-94).
            w_codes = qc["w_codes"].astype(jnp.int32)
            noise = jax.random.normal(self.make_rng("noise"),
                                      w_codes.shape, jnp.float32)
            eps_q = quantize(noise, NOISE_SCALE, NOISE_ZERO_POINT,
                             -128, 127, dtype=jnp.int32)
            prod = quantized_mul(
                qc["std_codes"].astype(jnp.int32), qc["std_scale"],
                qc["std_zp"], eps_q, NOISE_SCALE, NOISE_ZERO_POINT,
                qc["mul_scale"], qc["mul_zp"], -128, 127, dtype=jnp.int32)
            w_codes = quantized_add(
                w_codes, qc["w_scale"], qc["w_zp"], prod, qc["mul_scale"],
                qc["mul_zp"], qc["add_scale"], qc["add_zp"], -128, 127,
                dtype=jnp.int32)
            w_codes = jnp.clip(w_codes, wb[0], wb[1])  # clamp_weight
            w_scale, w_zp = qc["add_scale"], qc["add_zp"]
        else:
            w_codes = qc["w_codes"].astype(jnp.int32)
            w_scale, w_zp = qc["w_scale"], qc["w_zp"]
        codes = int_dense(
            x.codes, x.scale, x.zp, w_codes, w_scale, w_zp, bias,
            qc["act_scale"], qc["act_zp"], ab[0], ab[1], relu=self.relu)
        return QTensor(codes, qc["act_scale"], qc["act_zp"])


class ConvBlock(nn.Module, QuantOps):
    """Conv (+ optional BN fold + fused ReLU), pointwise or BBB.

    Covers the reference's conv / conv+BN / conv+BN+ReLU fusion cells in all
    precision modes (reference: src/models/stochastic/bbb/conv.py,
    quantized/conv_qat.py:26-49,139-167, quantized/conv_q.py). The QAT BN
    path reproduces the folding dance: weight and std are scaled by
    gamma/running_std before fake-quant, the conv output is un-scaled and
    then real BN is applied (reference: conv_qat.py:139-167). Conversion
    folds BN fully into the integer weights (reference: conv.py:70-80).
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0
    use_bias: bool = False
    stochastic: bool = False
    bn: bool = False
    relu: bool = False
    sigma_prior: float = 1.0
    std_init: float = -10.0
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    quant: QuantConfig = QuantConfig()
    # space-to-depth packed int8 conv (qbn_tpu.ops.s2d): None = auto
    # (3x3/stride-1/pad-1, narrow cout, even spatial dims), True/False force
    s2d: Optional[bool] = None
    # int+merged mode: emit the stage-resident phi packing directly
    # (qbn_tpu.ops.s2d_merged) — set on the stem feeding a packed stage
    s2d_pack_output: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, mode: str = "float",
                 update_stats: bool = False, defer_residual: bool = False):
        assert mode in MODES
        q = self.quant
        if isinstance(x, PackedQTensor):
            cin = x.channels                      # (B, hb, wb, S*4*cin)
        elif isinstance(x, MergedQTensor):
            cin = x.codes.shape[-1] // x.s        # (B, H, W, S*cin)
        elif isinstance(x, QTensor):
            cin = x.codes.shape[-1]
        else:
            cin = x.shape[-1]
        kshape = (*self.kernel_size, cin, self.features)
        w_init = _bbb_weight_init if self.stochastic else _torch_linear_init
        kernel = self.param("kernel", w_init, kshape)
        std = (self.param("std", nn.initializers.constant(self.std_init),
                          kshape) if self.stochastic else None)
        b_init = (_bbb_weight_init if self.stochastic
                  else _torch_bias_init(kshape[0] * kshape[1] * kshape[2]))
        bias = (self.param("bias", b_init, (self.features,))
                if self.use_bias else None)

        bn_scale = bn_bias = bn_mean = bn_var = None
        if self.bn:
            bn_scale = self.param("bn_scale", nn.initializers.ones,
                                  (self.features,))
            bn_bias = self.param("bn_bias", nn.initializers.zeros,
                                 (self.features,))
            bn_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((self.features,)))
            bn_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((self.features,)))

        if self.stochastic:
            self.sow("kl", "kl",
                     kl_divergence(kernel, softplus(std),
                                   jnp.zeros_like(kernel),
                                   jnp.full_like(std, self.sigma_prior)),
                     reduce_fn=lambda a, b: b)

        qc = None
        if q.enabled:
            qc = self.variable(
                "qconst", "q",
                lambda: _qc_placeholder({
                    "w_codes": kshape, "std_codes": kshape,
                    "w_scale": "scalar_f", "w_zp": "scalar_i",
                    "std_scale": "scalar_f", "std_zp": "scalar_i",
                    "mul_scale": "scalar_f", "mul_zp": "scalar_i",
                    "add_scale": "scalar_f", "add_zp": "scalar_i",
                    "act_scale": "scalar_f", "act_zp": "scalar_i",
                }) | {"bias_f": jnp.zeros((self.features,), jnp.float32),
                      "is_stoch": jnp.asarray(int(self.stochastic),
                                              jnp.int32),
                      "w_lo": jnp.asarray(q.w_bounds[0], jnp.int32),
                      "w_hi": jnp.asarray(q.w_bounds[1], jnp.int32)})

        if mode == "int":
            return self._int_forward(x, qc.value,
                                     defer_residual=defer_residual)

        if mode == "float":
            y = self._conv_forward(x, kernel, std, bias, train,
                                   fake_q=False, update=False)
            if self.bn:
                y = self._batch_norm(y, bn_scale, bn_bias, bn_mean, bn_var,
                                     train, update_stats)
            if self.relu:
                y = jax.nn.relu(y)
            return y

        # qat / convert
        if self.bn:
            # BN-folding QAT dance (reference: conv_qat.py:139-167):
            # fake-quant W*sf and softplus(std)*sf, conv, un-scale, real BN.
            running_std = jnp.sqrt(bn_var.value + self.bn_eps)
            sf = bn_scale / running_std
            y = self._conv_forward(x, kernel * sf, std, None, train,
                                   fake_q=True, update=update_stats,
                                   std_scale_factor=sf)
            y = y / sf
            if bias is not None:
                y = y + bias
            y = self._batch_norm(y, bn_scale, bn_bias, bn_mean, bn_var,
                                 train, update_stats)
        else:
            y = self._conv_forward(x, kernel, std, bias, train,
                                   fake_q=True, update=update_stats)
        if self.relu:
            y = jax.nn.relu(y)
        y = self._fq("act", y, q.a_bounds, update_stats)
        if mode == "convert":
            self._write_qconst(qc, kernel, std, bias,
                               bn_scale, bn_bias, bn_mean, bn_var)
        return y

    # -- shared conv core ----------------------------------------------------
    def _conv(self, x, w):
        return lax.conv_general_dilated(
            x, w, self.strides,
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def _conv_forward(self, x, w_eff, raw_std, bias, train, fake_q, update,
                      std_scale_factor=None):
        """Float or fake-quant conv forward (train: local reparam for BBB;
        eval: weight-space sampling). `w_eff` is the (possibly BN-scaled)
        kernel; `raw_std` the pre-softplus posterior std or None."""
        wb = self.quant.w_bounds
        w = self._fq("weight", w_eff, wb, update) if fake_q else w_eff
        if not self.stochastic:
            y = self._conv(x, w)
            return y + bias if bias is not None else y
        sp = softplus(raw_std)
        if std_scale_factor is not None:
            sp = sp * std_scale_factor
        sp = self._fq("std_w", sp, wb, update) if fake_q else sp
        if train:
            return local_reparam_conv(
                x, w, sp, self.make_rng("noise"), self.strides,
                [(self.padding, self.padding)] * 2, bias)
        noise = jax.random.normal(self.make_rng("noise"), w.shape,
                                  jnp.float32)
        if fake_q:
            prod = self._fq("mul_noise", noise * sp, wb, update)
            w_s = self._fq("add_weight", w + prod, wb, update)
        else:
            w_s = w + sp * noise
        y = self._conv(x, w_s)
        return y + bias if bias is not None else y

    # -- batch norm ----------------------------------------------------------
    def _batch_norm(self, y, scale, bias, mean_v, var_v, train, update):
        if train:
            m = jnp.mean(y, axis=(0, 1, 2))
            v = jnp.var(y, axis=(0, 1, 2))
            if update and not self.is_initializing():
                n = y.shape[0] * y.shape[1] * y.shape[2]
                unbiased = v * n / max(n - 1, 1)
                mom = self.bn_momentum
                mean_v.value = (1 - mom) * mean_v.value + mom * m
                var_v.value = (1 - mom) * var_v.value + mom * unbiased
        else:
            m, v = mean_v.value, var_v.value
        y = (y - m) * lax.rsqrt(v + self.bn_eps)
        return y * scale + bias

    # -- convert ---------------------------------------------------------------
    def _write_qconst(self, qc, kernel, std, bias,
                      bn_scale, bn_bias, bn_mean, bn_var):
        if self.is_initializing():
            return
        from qbn_tpu.quant.bn_fold import fuse_conv_bn_weights
        wb, ab = self.quant.w_bounds, self.quant.a_bounds
        sp = softplus(std) if std is not None else None
        w, b = kernel, bias
        if self.bn:
            w, b, folded_std = fuse_conv_bn_weights(
                kernel, bias, std, bn_mean.value, bn_var.value, self.bn_eps,
                bn_scale, bn_bias)
            sp = softplus(folded_std) if folded_std is not None else None
        entry = dict(qc.value)
        ws, wz = self._qparams("weight", wb)
        entry["w_codes"] = quantize(w, ws, wz, wb[0], wb[1])
        entry["w_scale"], entry["w_zp"] = ws, wz
        if self.stochastic:
            ss, sz = self._qparams("std_w", wb)
            entry["std_codes"] = quantize(sp, ss, sz, wb[0], wb[1])
            entry["std_scale"], entry["std_zp"] = ss, sz
            ms, mz = self._qparams("mul_noise", wb)
            entry["mul_scale"], entry["mul_zp"] = ms, mz
            as_, az = self._qparams("add_weight", wb)
            entry["add_scale"], entry["add_zp"] = as_, az
        acts, actz = self._qparams("act", ab)
        entry["act_scale"], entry["act_zp"] = acts, actz
        entry["bias_f"] = (b if b is not None
                           else jnp.zeros((self.features,), jnp.float32))
        qc.value = entry

    # -- int ---------------------------------------------------------------
    def _int_forward(self, x, qc, defer_residual: bool = False):
        q = self.quant
        wb, ab = q.w_bounds, q.a_bounds
        presampled = self.get_variable("sampled", "w", None)
        if (self.stochastic and presampled is not None
                and presampled.ndim == 5):
            # MERGED layout: presampled weights carry the full sample axis
            # (S, kh, kw, cin, cout) — one feature-grouped conv computes
            # every sample with NO sample-axis transpose (MergedQTensor;
            # ops.integer.int_conv_merged). The stem (shared QTensor input)
            # enters the layout via the merged-N conv.
            from qbn_tpu.ops.integer import int_conv_merged
            s = presampled.shape[0]
            if isinstance(x, PackedQTensor):
                # stage-resident space-to-depth: parity alternates per
                # conv, no layout ops (qbn_tpu.ops.s2d_merged)
                from qbn_tpu.ops.s2d_merged import (int_conv_s2d_merged,
                                                    eligible)
                assert eligible(self.kernel_size, self.strides,
                                self.padding, x.channels), \
                    "PackedQTensor reached an s2d-ineligible conv"
                to_psi = x.parity == "phi"
                codes = int_conv_s2d_merged(
                    x.codes, x.scale, presampled, qc["add_scale"],
                    qc["add_zp"], qc["bias_f"], qc["act_scale"],
                    qc["act_zp"], ab[0], ab[1], relu=self.relu,
                    to_psi=to_psi)
                return PackedQTensor(codes, qc["act_scale"],
                                     qc["act_zp"], s=s,
                                     parity="psi" if to_psi else "phi")
            if (self.s2d_pack_output and isinstance(x, QTensor)
                    and s2d_merged_enabled()):
                from qbn_tpu.ops.s2d_merged import (int_conv_s2d_stem,
                                                    eligible)
                if eligible(self.kernel_size, self.strides,
                            self.padding, x.codes.shape[-1]):
                    codes = int_conv_s2d_stem(
                        x.codes, x.scale, presampled, qc["add_scale"],
                        qc["add_zp"], qc["bias_f"], qc["act_scale"],
                        qc["act_zp"], ab[0], ab[1], relu=self.relu)
                    return PackedQTensor(codes, qc["act_scale"],
                                         qc["act_zp"], s=s, parity="phi")
            kwargs = dict(
                x_codes=x.codes, x_scale=x.scale, w_codes=presampled,
                w_scale=qc["add_scale"], w_zp=qc["add_zp"],
                bias=qc["bias_f"], out_scale=qc["act_scale"],
                out_zp=qc["act_zp"], strides=self.strides,
                padding=[(self.padding, self.padding)] * 2,
                a_lo=ab[0], a_hi=ab[1], relu=self.relu,
                shared_x=isinstance(x, QTensor))
            if defer_residual and isinstance(x, MergedQTensor):
                return DeferredMergedConv(kwargs, s, qc["act_scale"],
                                          qc["act_zp"])
            out = int_conv_merged(**kwargs)
            return MergedQTensor(out, qc["act_scale"], qc["act_zp"], s=s)
        if isinstance(x, MergedQTensor):
            # merged activations through a deterministic conv: broadcast
            # the shared weights over the sample groups
            from qbn_tpu.ops.integer import int_conv_merged
            w8 = qc["w_codes"].astype(jnp.int8)
            kwargs = dict(
                x_codes=x.codes, x_scale=x.scale,
                w_codes=jnp.broadcast_to(w8, (x.s,) + w8.shape),
                w_scale=qc["w_scale"], w_zp=qc["w_zp"],
                bias=qc["bias_f"], out_scale=qc["act_scale"],
                out_zp=qc["act_zp"], strides=self.strides,
                padding=[(self.padding, self.padding)] * 2,
                a_lo=ab[0], a_hi=ab[1], relu=self.relu)
            if defer_residual:
                return DeferredMergedConv(kwargs, x.s, qc["act_scale"],
                                          qc["act_zp"])
            out = int_conv_merged(**kwargs)
            return MergedQTensor(out, qc["act_scale"], qc["act_zp"],
                                 s=x.s)
        if self.stochastic and presampled is not None:
            w_codes = presampled.astype(jnp.int32)
            w_scale, w_zp = qc["add_scale"], qc["add_zp"]
        elif self.stochastic:
            w_codes = qc["w_codes"].astype(jnp.int32)
            noise = jax.random.normal(self.make_rng("noise"),
                                      w_codes.shape, jnp.float32)
            eps_q = quantize(noise, NOISE_SCALE, NOISE_ZERO_POINT,
                             -128, 127, dtype=jnp.int32)
            prod = quantized_mul(
                qc["std_codes"].astype(jnp.int32), qc["std_scale"],
                qc["std_zp"], eps_q, NOISE_SCALE, NOISE_ZERO_POINT,
                qc["mul_scale"], qc["mul_zp"], -128, 127, dtype=jnp.int32)
            w_codes = quantized_add(
                w_codes, qc["w_scale"], qc["w_zp"], prod, qc["mul_scale"],
                qc["mul_zp"], qc["add_scale"], qc["add_zp"], -128, 127,
                dtype=jnp.int32)
            w_codes = jnp.clip(w_codes, wb[0], wb[1])
            w_scale, w_zp = qc["add_scale"], qc["add_zp"]
        else:
            w_codes = qc["w_codes"].astype(jnp.int32)
            w_scale, w_zp = qc["w_scale"], qc["w_zp"]
        if self._use_s2d(x):
            from qbn_tpu.ops.s2d import pack_weights_s2d, int_conv_s2d
            codes = int_conv_s2d(
                x.codes, x.scale, pack_weights_s2d(w_codes.astype(jnp.int8)),
                self.features, w_scale, w_zp, qc["bias_f"],
                qc["act_scale"], qc["act_zp"], ab[0], ab[1], relu=self.relu)
        else:
            codes = int_conv(
                x.codes, x.scale, x.zp, w_codes, w_scale, w_zp, qc["bias_f"],
                qc["act_scale"], qc["act_zp"], self.strides,
                [(self.padding, self.padding)] * 2, ab[0], ab[1],
                relu=self.relu)
        return QTensor(codes, qc["act_scale"], qc["act_zp"])

    def _use_s2d(self, x: QTensor) -> bool:
        """Space-to-depth packed conv: OFF by default — measured SLOWER
        than the merged-sample-axis conv path under XLA (the f32
        depth-to-space transpose dominates; see tools/microbench_conv.py).
        Force per-layer with s2d=True or globally with QBN_S2D=on for
        experiments; the math stays exactness-tested (tests/test_int_conv)."""
        import os
        eligible = (self.kernel_size == (3, 3)
                    and tuple(self.strides) == (1, 1) and self.padding == 1
                    and x.codes.shape[1] % 2 == 0
                    and x.codes.shape[2] % 2 == 0)
        if self.s2d:
            assert eligible, "s2d forced on an ineligible conv"
            return True
        if os.environ.get("QBN_S2D", "off") == "on":
            return eligible and self.features <= 48
        return False


class BernoulliDropout(nn.Module, QuantOps):
    """Always-on Bernoulli dropout with per-(sample, channel) conv masks.

    Mirrors the reference BernoulliDropout: active in train AND eval (that is
    the MC-Dropout posterior), with 4-D inputs masked per (batch, channel)
    broadcast over space, and the masked multiply routed through an observed
    quantised multiply in qat/int modes
    (reference: src/models/stochastic/mcdropout/dropout.py:15-40).
    """
    p: float = 0.0
    quant: QuantConfig = QuantConfig()

    @nn.compact
    def __call__(self, x, *, train: bool = False, mode: str = "float",
                 update_stats: bool = False):
        if self.p <= 0.0:
            return x
        multiplier = 1.0 / (1.0 - self.p)
        is_q = isinstance(x, QTensor)
        shape = x.codes.shape if is_q else x.shape
        if len(shape) > 2:
            mask_shape = (shape[0], 1, 1, shape[-1])  # per-(sample, channel)
        else:
            mask_shape = shape
        mask = jax.random.bernoulli(
            self.make_rng("dropout"), 1.0 - self.p, mask_shape
        ).astype(jnp.float32)

        if mode in ("qat", "convert"):
            y = self._fq("mul_mask", x * mask, self.quant.a_bounds,
                         update_stats)
            if mode == "convert":
                qc = self.variable("qconst", "q", lambda: _qc_placeholder(
                    {"mul_scale": "scalar_f", "mul_zp": "scalar_i"}))
                if not self.is_initializing():
                    ms, mz = self._qparams("mul_mask", self.quant.a_bounds)
                    qc.value = {"mul_scale": ms, "mul_zp": mz}
            return y * multiplier
        if mode == "int":
            qc = self.variable("qconst", "q", lambda: _qc_placeholder(
                {"mul_scale": "scalar_f", "mul_zp": "scalar_i"}))
            ms, mz = qc.value["mul_scale"], qc.value["mul_zp"]
            ab = self.quant.a_bounds
            # the mask itself is quantised on the output grid (reference
            # dropout.py:31-34), then multiply + requantise
            mask_deq = dequantize(quantize(mask, ms, mz, 0, 255,
                                           dtype=jnp.int32), ms, mz)
            prod = dequantize_codes(x.codes, x.scale) * mask_deq
            codes = quantize_codes(prod, ms, mz, ab[0], ab[1])
            # mul_scalar: output scale = scale * multiplier, codes unchanged
            return QTensor(codes, ms * multiplier, mz)
        # observer variable must exist in float mode too for tree parity
        if self.quant.enabled:
            self._obs("mul_mask")
        return x * mask * multiplier


class ResidualAdd(nn.Module, QuantOps):
    """Quant-safe residual add (reference: src/utils.py:49-55 Add module).

    relu=True folds the block's post-add ReLU in (observation still sees
    the PRE-relu sum, matching the reference's FloatFunctional.add
    followed by a bare relu); in the int+merged path, receiving a
    DeferredMergedConv as `a` runs add+relu INSIDE the producing conv's
    requant epilogue (see ops.integer.int_conv_merged residual args)."""
    quant: QuantConfig = QuantConfig()
    relu: bool = False

    @nn.compact
    def __call__(self, a, b, *, mode: str = "float",
                 update_stats: bool = False):
        if mode == "float":
            if self.quant.enabled:
                self._obs("add_act")
            y = a + b
            return jax.nn.relu(y) if self.relu else y
        if mode in ("qat", "convert"):
            y = self._fq("add_act", a + b, self.quant.a_bounds, update_stats)
            if mode == "convert":
                qc = self.variable("qconst", "q", lambda: _qc_placeholder(
                    {"scale": "scalar_f", "zp": "scalar_i"}))
                if not self.is_initializing():
                    s, z = self._qparams("add_act", self.quant.a_bounds)
                    qc.value = {"scale": s, "zp": z}
            return jax.nn.relu(y) if self.relu else y
        # int: dequant both operands, add, requant. The optimization
        # barriers stop XLA from SINKING each producing conv's requant
        # epilogue out of the conv and into this add's fusion — without
        # them the conv materialises its raw f32 accumulator (4x the int8
        # bytes) and the requant re-reads it, measured at ~2x the whole
        # block-tail cost at ResNet stage-1/2 shapes
        # (tools/microbench_resadd.py; HLO evidence in tools/dump_hlo.py:
        # 'convolution_multiply_fusion' emitting f32[256,32,32,480]).
        qc = self.variable("qconst", "q", lambda: _qc_placeholder(
            {"scale": "scalar_f", "zp": "scalar_i"}))
        s, z = qc.value["scale"], qc.value["zp"]
        ab = self.quant.a_bounds
        if isinstance(a, DeferredMergedConv):
            # fused path: requant + add + relu ride the conv's epilogue
            from qbn_tpu.ops.integer import int_conv_merged
            out = int_conv_merged(
                **a.kwargs, residual=b.codes, res_scale=b.scale,
                res_out_scale=s, res_out_zp=z, res_relu=self.relu)
            return MergedQTensor(out, s, z, s=a.s)
        a_codes = lax.optimization_barrier(a.codes)
        b_codes = lax.optimization_barrier(b.codes)
        total = (dequantize_codes(a_codes, a.scale)
                 + dequantize_codes(b_codes, b.scale))
        codes = quantize_codes(total, s, z, ab[0], ab[1])
        if self.relu:
            codes = jnp.maximum(codes, jnp.int8(0))  # u >= 0 <=> q >= zp
        if isinstance(a, PackedQTensor):
            # packed borders stay exactly zero: dequant(0)+dequant(0)=0
            # requantises to code zp, i.e. u = 0
            assert isinstance(b, PackedQTensor) and b.parity == a.parity
            return PackedQTensor(codes, s, z, s=a.s, parity=a.parity)
        if isinstance(a, MergedQTensor):
            return MergedQTensor(codes, s, z, s=a.s)
        return QTensor(codes, s, z)


class InputQuant(nn.Module, QuantOps):
    """QuantStub equivalent: input activation observer / quantiser."""
    quant: QuantConfig = QuantConfig()

    @nn.compact
    def __call__(self, x, *, mode: str = "float", update_stats: bool = False):
        if not self.quant.enabled or mode == "float":
            if self.quant.enabled:
                self._obs("act")
            return x
        if mode in ("qat", "convert"):
            y = self._fq("act", x, self.quant.a_bounds, update_stats)
            if mode == "convert":
                qc = self.variable("qconst", "q", lambda: _qc_placeholder(
                    {"scale": "scalar_f", "zp": "scalar_i"}))
                if not self.is_initializing():
                    s, z = self._qparams("act", self.quant.a_bounds)
                    qc.value = {"scale": s, "zp": z}
            return y
        qc = self.variable("qconst", "q", lambda: _qc_placeholder(
            {"scale": "scalar_f", "zp": "scalar_i"}))
        s, z = qc.value["scale"], qc.value["zp"]
        ab = self.quant.a_bounds
        return QTensor(quantize_codes(x, s, z, ab[0], ab[1]), s, z)


def dequant(x):
    """DeQuantStub equivalent: quantised codes back to float32.

    MergedQTensor dense activations (B, S, F) dequantise to (B, S, F)
    floats — the caller (evaluation.mc) moves the sample axis out front.
    """
    if isinstance(x, (QTensor, MergedQTensor)):
        return dequantize_codes(x.codes, x.scale)
    return x


def max_pool(x, window: int = 2, stride: int = 2):
    """Max pool, mode-polymorphic: integer codes pool by max directly."""
    if isinstance(x, (QTensor, MergedQTensor)):
        codes = lax.reduce_window(
            x.codes, jnp.int8(-128), lax.max,
            (1, window, window, 1), (1, stride, stride, 1), "VALID")
        if isinstance(x, MergedQTensor):
            return MergedQTensor(codes, x.scale, x.zp, s=x.s)
        return QTensor(codes, x.scale, x.zp)
    return nn.max_pool(x, (window, window), (stride, stride), "VALID")


def avg_pool(x, window: int):
    """Average pool; integer codes average with round-to-nearest-even
    (FBGEMM quantised avg-pool keeps scale/zp and rounds)."""
    if isinstance(x, (QTensor, MergedQTensor)):
        summed = lax.reduce_window(
            x.codes.astype(jnp.int32), 0, lax.add,
            (1, window, window, 1), (1, window, window, 1), "VALID")
        codes = jnp.round(summed.astype(jnp.float32)
                          / (window * window)).astype(jnp.int8)
        if isinstance(x, MergedQTensor):
            return MergedQTensor(codes, x.scale, x.zp, s=x.s)
        return QTensor(codes, x.scale, x.zp)
    return nn.avg_pool(x, (window, window), (window, window), "VALID")


def flatten(x):
    if isinstance(x, MergedQTensor):
        # (B, H, W, S*C) -> per-sample flattening (B, S, H*W*C) so dense
        # weights see the same feature order as the per-sample layout
        b, h, w, sc = x.codes.shape
        c = sc // x.s
        codes = x.codes.reshape(b, h, w, x.s, c).transpose(0, 3, 1, 2, 4)
        return MergedQTensor(codes.reshape(b, x.s, h * w * c),
                             x.scale, x.zp, s=x.s)
    if isinstance(x, QTensor):
        return QTensor(x.codes.reshape(x.codes.shape[0], -1), x.scale, x.zp)
    return x.reshape(x.shape[0], -1)


def relu(x):
    """Standalone ReLU (e.g. after a residual add): on integer codes this is
    max(code, zero_point), with no new observer — matching the converted
    reference nets where a bare ReLU acts on the quantised tensor."""
    if isinstance(x, (QTensor, MergedQTensor, PackedQTensor)):
        # zero-point-removed codes: q >= zp  <=>  u >= 0
        codes = jnp.maximum(x.codes, jnp.int8(0))
        if isinstance(x, PackedQTensor):
            return PackedQTensor(codes, x.scale, x.zp, s=x.s,
                                 parity=x.parity)
        if isinstance(x, MergedQTensor):
            return MergedQTensor(codes, x.scale, x.zp, s=x.s)
        return QTensor(codes, x.scale, x.zp)
    return jax.nn.relu(x)
