"""Loss and metric parity tests against hand computations and torch
(reference formulas: src/losses.py:18-51, src/metrics.py:8-229)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qbn_tpu.training.losses import classification_loss, regression_loss
from qbn_tpu.training.metrics import (
    cls_metrics_init, cls_metrics_update, cls_metrics_compute,
    reg_metrics_init, reg_metrics_update, reg_metrics_compute,
)

try:
    import torch
    import torch.nn.functional as F
    HAVE_TORCH = True
except Exception:  # pragma: no cover
    HAVE_TORCH = False



pytestmark = pytest.mark.smoke

def _rand_probs(rng, b, c):
    logits = rng.randn(b, c).astype(np.float32)
    e = np.exp(logits - logits.max(1, keepdims=True))
    return e / e.sum(1, keepdims=True)


@pytest.mark.skipif(not HAVE_TORCH, reason="torch unavailable")
def test_classification_loss_matches_torch():
    rng = np.random.RandomState(0)
    probs = _rand_probs(rng, 16, 10)
    target = rng.randint(0, 10, 16)
    kl, gamma, n_batches, n_points = 3.7, 0.01, 40, 10000

    for scaling, mult in [("batch", 1.0), ("whole", 2.0)]:
        t_ce = F.nll_loss(torch.log(torch.from_numpy(probs) + 1e-8),
                          torch.from_numpy(target))
        if scaling == "whole":
            t_ce = n_points * t_ce * mult
            t_kl = kl / n_batches
        else:
            t_kl = kl / (16 * n_batches)
        t_loss = t_ce + gamma * t_kl

        loss, ce, klt = classification_loss(
            jnp.asarray(probs), jnp.asarray(target), kl, gamma, n_batches,
            n_points, scaling=scaling, loss_multiplier=mult)
        assert np.isclose(float(loss), float(t_loss), rtol=1e-5)
        assert np.isclose(float(ce), float(t_ce), rtol=1e-5)
        assert np.isclose(float(klt), float(t_kl), rtol=1e-6)


def test_regression_loss_hand_computed():
    mean = jnp.array([[1.0], [2.0]])
    var = jnp.array([[0.5], [2.0]])
    target = jnp.array([[1.5], [1.0]])
    # per-point: (t-m)^2/(v+1e-8) + log(v+1e-8)
    p0 = 0.25 / (0.5 + 1e-8) + np.log(0.5 + 1e-8)
    p1 = 1.0 / (2.0 + 1e-8) + np.log(2.0 + 1e-8)
    het = (p0 + p1) / 2
    loss, main, klt = regression_loss((mean, var), target, 4.0, 0.1, 10, 100,
                                      scaling="batch")
    assert np.isclose(float(main), het, rtol=1e-6)
    assert np.isclose(float(klt), 4.0 / (2 * 10))
    assert np.isclose(float(loss), het + 0.1 * 4.0 / 20, rtol=1e-6)


@pytest.mark.skipif(not HAVE_TORCH, reason="torch unavailable")
def test_cls_metrics_match_torch_reference_formulas():
    rng = np.random.RandomState(3)
    state = cls_metrics_init()
    all_p, all_t = [], []
    for _ in range(3):
        p = _rand_probs(rng, 32, 10)
        t = rng.randint(0, 10, 32)
        state = cls_metrics_update(state, jnp.asarray(p), jnp.asarray(t))
        all_p.append(p)
        all_t.append(t)
    out = {k: float(v) for k, v in cls_metrics_compute(state).items()}

    p = np.concatenate(all_p)
    t = np.concatenate(all_t)
    n = len(t)
    one_hot = np.eye(10)[t]
    assert np.isclose(out["error"], np.mean(p.argmax(1) != t), atol=1e-6)
    assert np.isclose(out["nll"], np.sum(-one_hot * np.log(p + 1e-8)) / n,
                      rtol=1e-5)
    assert np.isclose(out["brier"], np.sum((p - one_hot) ** 2) / n, rtol=1e-5)
    assert np.isclose(out["entropy"], np.sum(-p * np.log(p + 1e-8)) / n,
                      rtol=1e-5)

    # ECE vs torchmetrics if importable, else manual binning
    try:
        import torchmetrics
        ece = torchmetrics.CalibrationError(
            n_bins=10, task="multiclass", norm="l1", num_classes=10)
        ece.update(torch.from_numpy(p), torch.from_numpy(t))
        expected = float(ece.compute())
    except Exception:
        conf = p.max(1)
        correct = (p.argmax(1) == t).astype(np.float32)
        # torchmetrics binning: bucketize(conf, boundaries, right=True)-1
        boundaries = np.linspace(0.0, 1.0, 11, dtype=np.float32)
        bins = np.clip(
            np.searchsorted(boundaries, conf, side="right") - 1, 0, 9)
        expected = 0.0
        for b in range(10):
            m = bins == b
            if m.sum():
                expected += abs(correct[m].mean() - conf[m].mean()) * m.sum()
        expected /= n
    assert np.isclose(out["ece"], expected, atol=1e-5)


def test_ece_boundary_confidence_hand_computed():
    """Pin the bin-edge semantics with hand-computed values: a confidence
    exactly on a (float32) bin boundary goes to the UPPER bin, as in
    torchmetrics' bucketize(..., right=True) (the reference ECE,
    src/metrics.py:381-383). Chosen so upper-vs-lower binning changes the
    GROUPING and therefore the ECE value: under floor/lower-bin semantics
    the float32 0.7 confidences would share a bin with the 0.62 one and
    the answer would be ~0.104 instead."""
    c7 = np.float32(0.7)    # 0.69999998807... < 0.7 — the adversarial case
    c62 = np.float32(0.62)
    rows, targets = [], []

    def row(conf, cls):
        r = np.full(10, (1.0 - float(conf)) / 9.0, np.float32)
        r[cls] = conf
        return r

    rows = np.stack([
        row(c7, 0),    # bin 7 (upper), correct
        row(c7, 0),    # bin 7, incorrect
        row(c62, 0),   # bin 6, correct
        row(np.float32(0.5), 0),   # exactly 0.5 -> bin 5, correct
        row(np.float32(1.0) - 0.0, 0),  # conf 1.0 -> clamps to bin 9
    ])
    rows[4] = 0.0
    rows[4, 0] = 1.0
    targets = np.array([0, 1, 0, 0, 0])

    state = cls_metrics_init()
    state = cls_metrics_update(state, jnp.asarray(rows),
                               jnp.asarray(targets))
    ece = float(cls_metrics_compute(state)["ece"])
    # hand computation (5 samples):
    #   bin 7: {c7 correct, c7 wrong}: |0.5 - 0.69999998807| * 2/5
    #   bin 6: {c62 correct}:          |1.0 - 0.62000000477| * 1/5
    #   bin 5: {0.5 correct}:          |1.0 - 0.5|           * 1/5
    #   bin 9: {1.0 correct}:          0
    expected = (abs(0.5 - 0.699999988079071) * 2
                + abs(1.0 - 0.620000004768372)
                + 0.5) / 5.0            # = 0.2559999943...
    assert abs(ece - expected) < 1e-6, (ece, expected)


def test_reg_metrics_hand_computed():
    state = reg_metrics_init()
    mean = jnp.array([1.0, 2.0])
    var = jnp.array([0.5, 2.0])
    target = jnp.array([1.5, 1.0])
    state = reg_metrics_update(state, mean, var, target)
    out = {k: float(v) for k, v in reg_metrics_compute(state).items()}
    err = np.array([0.5, -1.0])
    v = np.array([0.5, 2.0])
    nll = np.sum(0.5 * np.log(2 * np.pi * v + 1e-8)
                 + err ** 2 / (2 * v + 1e-8)) / 2
    assert np.isclose(out["nll"], nll, rtol=1e-4)  # f32 vs f64 headroom
    assert np.isclose(out["mse"], np.mean(err ** 2), rtol=1e-6)
    assert np.isclose(out["rmse"], np.sqrt(np.mean(err ** 2)), rtol=1e-6)
    assert np.isclose(out["mae"], np.mean(np.abs(err)), rtol=1e-6)
