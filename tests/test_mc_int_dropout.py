"""MC evaluation on the INT path for MC-Dropout: per-sample dropout masks
must differ under the vmapped sample axis and produce valid probabilities."""

import numpy as np
import jax
import jax.numpy as jnp

from qbn_tpu.config import Config
from qbn_tpu.evaluation.mc import mc_predict, aggregate
from qbn_tpu.models.factory import build_model
from qbn_tpu.utils import init_variables, apply_model, convert_model

KEY = jax.random.PRNGKey(0)


def test_mcdropout_int_mc_eval():
    cfg = Config(model="conv_lenet_mc", p=0.3, at=True, q=True,
                 output_size=10, samples=6)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 28, 28, 1))
    variables = init_variables(model, KEY, x, quantized=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=True,
                                  mode="qat", update_stats=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=False,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, KEY)

    outs = mc_predict(model, variables, x, jax.random.PRNGKey(2),
                      samples=6, mode="int")
    outs = np.asarray(outs)
    assert outs.shape == (6, 2, 10)
    # different dropout masks per sample -> different outputs
    assert not np.allclose(outs[0], outs[1])
    probs = np.asarray(aggregate("classification", jnp.asarray(outs), 6))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_mask_quantisation_matches_torch_quantize_per_tensor():
    """The INT dropout quantises the {0,1} mask on the mul's OWN output
    grid, exactly as the reference does with torch.quantize_per_tensor
    (reference: src/models/stochastic/mcdropout/dropout.py:31-34). Pin
    our mask codes/dequant to torch over fine AND coarse scales — at
    scale > 2/3 with zero-point 0 the kept-mask value 1.0 rounds to the
    zero-point, i.e. BOTH stacks zero the whole activation (observed in
    the campaign's mcdropout a4/a3 cells)."""
    import torch

    from qbn_tpu.quant.fake_quant import dequantize, quantize

    mask = np.array([0.0, 1.0], np.float32)
    for scale, zp in [(0.0757, 19), (0.3282, 10), (0.702985, 10),
                      (1.8284, 0), (4.031174, 0)]:
        t = torch.quantize_per_tensor(torch.tensor(mask), scale, zp,
                                      torch.quint8)
        ours_codes = np.asarray(quantize(jnp.asarray(mask), scale, zp,
                                         0, 255, dtype=jnp.int32))
        np.testing.assert_array_equal(ours_codes,
                                      t.int_repr().numpy().astype(np.int32))
        ours_deq = np.asarray(dequantize(
            quantize(jnp.asarray(mask), scale, zp, 0, 255,
                     dtype=jnp.int32), scale, zp))
        np.testing.assert_allclose(ours_deq, t.dequantize().numpy(),
                                   rtol=1e-6)
    # the coarse-scale case zeroes the kept mask entirely
    t = torch.quantize_per_tensor(torch.tensor(mask), 4.031174, 0,
                                  torch.quint8)
    assert t.dequantize().numpy()[1] == 0.0


def test_mcdropout_int_collapse_at_coarse_mask_scale():
    """End-to-end miniature of the campaign's mcdropout a4 finding: with
    4-bit activations and large layer output ranges, the mul observer's
    scale exceeds 2/3, the quantised mask zeroes every activation, and
    the (bias-free) converted LeNet predicts EXACTLY uniform. This is
    reference-faithful (same mask-quantisation semantics, see test
    above), so the collapse must reproduce — a 'fix' that keeps accuracy
    here would be a parity break."""
    cfg = Config(model="conv_lenet_mc", p=0.2, at=True, q=True,
                 output_size=10, samples=4, activation_precision=4)
    model = build_model(cfg)
    # large inputs -> large observed ranges -> coarse 4-bit grids
    x = 50.0 * jax.random.uniform(jax.random.PRNGKey(1), (2, 28, 28, 1))
    variables = init_variables(model, KEY, x, quantized=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=True,
                                  mode="qat", update_stats=True)
    _, _, variables = apply_model(model, variables, x, KEY, train=False,
                                  mode="qat", update_stats=True)
    variables = convert_model(model, variables, x, KEY)
    # precondition: at least the last dropout's grid is coarse enough
    # that mask 1.0 rounds to the zero-point
    ms = float(np.asarray(
        variables["qconst"]["drop_2"]["q"]["mul_scale"]))
    assert ms > 2.0 / 3.0, f"test setup no longer coarse: scale={ms}"
    outs = np.asarray(mc_predict(model, variables, x, jax.random.PRNGKey(2),
                                 samples=4, mode="int"))
    np.testing.assert_allclose(outs, 0.1, atol=1e-6)
