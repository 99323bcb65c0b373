"""Device-resident epoch scan (training/trainer.py): a whole epoch as one
lax.scan over the on-device dataset, with the loader's shuffle and
crop/flip draws replayed on device (loaders.epoch_plan).

Equivalence contract, split by what XLA can guarantee:

- The DATA STREAM is bitwise identical: epoch_plan consumes the loader's
  RandomState exactly like one __iter__ pass, and the device replay of
  crop/flip/normalize reproduces the host batches bit-for-bit across
  consecutive epochs (so scanned and host epochs interleave exactly).
- The dense/regression TRAIN path is bitwise identical end-to-end (same
  params, same metrics, two epochs, remainder batch on the eval side).
- The conv TRAIN path is NOT bitwise: the scan body and the standalone
  step are two different XLA compilations of the same HLO, and the conv
  backward rounds differently at the ULP level (measured: step-0 params
  match to 1e-5 through Adam, then chaos amplifies on random data). The
  conv test therefore pins (a) step-0 loss bitwise, (b) one-epoch metrics
  to a small tolerance, and (c) EVAL metrics on identical params to tight
  rtol (no update feedback -> no chaos).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.config import Config
from qbn_tpu.data import datasets as D
from qbn_tpu.data.loaders import ArrayLoader, augment_cifar
from qbn_tpu.models.factory import build_model
from qbn_tpu.training.optim import build_optimizer
from qbn_tpu.training.trainer import (Trainer, _device_augment_cifar,
                                      _device_normalize)
from qbn_tpu.utils import init_variables

KEY = jax.random.PRNGKey(0)


def _cifar_arrays(n=40, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(n, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 10, n).astype(np.int64)
    return x, y


def _norm(a):
    return D.normalize(a, "cifar")


def _conv_loaders():
    xt, yt = _cifar_arrays(44)                        # 5 full + 4 tail
    xv, yv = _cifar_arrays(20, seed=7)
    train = ArrayLoader(xt, yt, 8, shuffle=True, seed=3,
                        augment=augment_cifar, normalize=_norm)
    train.normalize_kind = "cifar"
    valid = ArrayLoader(xv, yv, 8, shuffle=False, normalize=_norm)
    valid.normalize_kind = "cifar"                    # 2 full + 4 remainder
    return train, valid


def test_epoch_plan_replays_host_stream_bitwise():
    """Two consecutive epochs: the jitted device replay of epoch_plan's
    (permutation, crop/flip draws) must equal the host loader's batches
    bit-for-bit, and both must consume the RandomState identically so the
    streams stay in lockstep across epochs."""
    xt, yt = _cifar_arrays(44)
    host_loader, _ = _conv_loaders()
    plan_loader, _ = _conv_loaders()

    @jax.jit
    def replay(xe, ys, xs, fl):
        xb = _device_augment_cifar(xe, ys, xs, fl)
        return _device_normalize(xb, "cifar")

    for _epoch in range(2):
        host = [(x.copy(), y.copy()) for x, y in host_loader]
        idx, aug, tail_aug = plan_loader.epoch_plan()
        bsz = plan_loader.batch_size
        k = len(xt) // bsz                            # full batches
        assert len(host) == k + 1                     # + ragged tail
        xe = jnp.asarray(xt)[jnp.asarray(idx[:k * bsz])].reshape(
            (k, bsz) + xt.shape[1:])
        for b in range(k):
            dev = replay(xe[b], *(jnp.asarray(a[b]) for a in aug))
            np.testing.assert_array_equal(np.asarray(dev), host[b][0])
            np.testing.assert_array_equal(
                yt[idx[b * bsz:(b + 1) * bsz]], host[b][1])
        # ragged tail batch: separate draws, same stream position
        dev = replay(jnp.asarray(xt)[jnp.asarray(idx[k * bsz:])],
                     *(jnp.asarray(a) for a in tail_aug))
        np.testing.assert_array_equal(np.asarray(dev), host[k][0])
        np.testing.assert_array_equal(yt[idx[k * bsz:]], host[k][1])


def _run_epochs(cfg, mk_loaders, n_epochs, scan, monkeypatch,
                mode="float"):
    if scan:
        monkeypatch.setenv("QBN_EPOCH_SCAN", "on")
    else:
        monkeypatch.setenv("QBN_EPOCH_SCAN", "off")
    train, valid = mk_loaders()
    model = build_model(cfg)
    tx, _ = build_optimizer(cfg, len(train))
    trainer = Trainer(model, cfg, tx, mode=mode, train_loader=train,
                      valid_loader=valid)
    variables = init_variables(model, KEY, train.x[:cfg.batch_size],
                               quantized=(mode == "qat"))
    state = trainer.init_state(variables, jax.random.PRNGKey(cfg.seed))
    ms = []
    for ep in range(n_epochs):
        state, tm = trainer.train_epoch(state)
        state, vm = trainer.eval_epoch(state, valid, seed=ep)
        ms.append((tm, vm))
    return state, trainer, ms


def test_epoch_scan_bitwise_regression(monkeypatch):
    """Dense path: scan == host loop bitwise (params and metrics), two
    epochs, shuffled train + remainder batch on eval."""
    cfg = Config(model="linear", task="regression",
                 dataset="regression_synthetic", output_size=1,
                 batch_size=20, learning_rate=1e-2, optimizer="adam",
                 gamma=0.0, lr_schedule="constant", seed=3)
    rng = np.random.RandomState(1)
    xt = rng.rand(110, 4).astype(np.float32)         # 5 full + 10 tail
    yt = rng.randn(110, 1).astype(np.float32)

    def mk():
        train = ArrayLoader(xt, yt, 20, shuffle=True, seed=3)
        valid = ArrayLoader(xt[:50], yt[:50], 20, shuffle=False)
        return train, valid

    out = {}
    for scan in (True, False):
        state, _, ms = _run_epochs(cfg, mk, 2, scan, monkeypatch)
        out[scan] = (jax.tree.map(np.asarray, state.params), ms)

    p1, m1 = out[True]
    p2, m2 = out[False]
    assert m1 == m2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_epoch_scan_conv_tracks_host_loop(monkeypatch):
    """Conv path (CIFAR augment recipe). Bitwise is not an XLA guarantee
    across compilations (see module docstring); pin one-epoch train and
    eval metrics to a tolerance that a real numerics bug (wrong batch
    order, wrong crop, wrong key) would blow through."""
    cfg = Config(model="conv_resnet", dataset="cifar", output_size=10,
                 batch_size=8, learning_rate=1e-3, optimizer="adam",
                 gamma=0.0, lr_schedule="constant", seed=3)
    out = {}
    for scan in (True, False):
        _, _, ms = _run_epochs(cfg, _conv_loaders, 1, scan, monkeypatch)
        out[scan] = ms[0]
    (tm1, vm1), (tm2, vm2) = out[True], out[False]
    for k in tm2:
        assert np.isclose(tm1[k], tm2[k], atol=5e-2), (k, tm1[k], tm2[k])
    for k in vm2:
        assert np.isclose(vm1[k], vm2[k], atol=5e-2), (k, vm1[k], vm2[k])


def test_epoch_scan_qat_dense_bitwise(monkeypatch):
    """QAT mode through the scan: quant-observer state rides the scan
    carry exactly like params. Dense path => bitwise TRAIN side (params,
    observer EMA ranges, train metrics) vs the host loop, two epochs.
    Valid metrics get a 1e-5 rtol: the scanned and host eval epochs are
    two XLA compilations of the same HLO and the fake-quant + log(nll)
    chain can round differently at the last ULP (observed: one ULP in
    epoch-2 nll with bit-identical params and inputs)."""
    cfg = Config(model="linear", task="regression",
                 dataset="regression_synthetic", output_size=1,
                 batch_size=20, learning_rate=1e-2, optimizer="adam",
                 gamma=0.0, lr_schedule="constant", seed=3, q=True, at=True)
    rng = np.random.RandomState(1)
    xt = rng.rand(110, 4).astype(np.float32)         # 5 full + 10 tail
    yt = rng.randn(110, 1).astype(np.float32)

    def mk():
        train = ArrayLoader(xt, yt, 20, shuffle=True, seed=3)
        valid = ArrayLoader(xt[:50], yt[:50], 20, shuffle=False)
        return train, valid

    out = {}
    for scan in (True, False):
        state, _, ms = _run_epochs(cfg, mk, 2, scan, monkeypatch,
                                   mode="qat")
        out[scan] = (jax.tree.map(np.asarray, state.params),
                     jax.tree.map(np.asarray,
                                  state.model_state.get("quant", {})), ms)

    p1, q1, m1 = out[True]
    p2, q2, m2 = out[False]
    for (tm1, vm1), (tm2, vm2) in zip(m1, m2):
        assert tm1 == tm2
        assert set(vm1) == set(vm2)
        for k in vm2:
            assert np.isclose(vm1[k], vm2[k], rtol=1e-5, atol=0.0), \
                (k, vm1[k], vm2[k])
    assert jax.tree.leaves(q1), "QAT run must carry observer state"
    for a, b in zip(jax.tree.leaves((p1, q1)), jax.tree.leaves((p2, q2))):
        np.testing.assert_array_equal(a, b)


def test_eval_scan_matches_host_on_same_params(monkeypatch):
    """Eval has no update feedback: scanning the eval epoch on IDENTICAL
    (untrained) params must reproduce the host loop's metrics to tight
    tolerance, including the remainder batch handled on host."""
    cfg = Config(model="conv_resnet", dataset="cifar", output_size=10,
                 batch_size=8, learning_rate=1e-3, optimizer="adam",
                 gamma=0.0, lr_schedule="constant", seed=3)
    out = {}
    for scan in (True, False):
        if scan:
            monkeypatch.setenv("QBN_EPOCH_SCAN", "on")
        else:
            monkeypatch.setenv("QBN_EPOCH_SCAN", "off")
        train, valid = _conv_loaders()
        model = build_model(cfg)
        tx, _ = build_optimizer(cfg, len(train))
        trainer = Trainer(model, cfg, tx, mode="float", train_loader=train,
                          valid_loader=valid)
        variables = init_variables(model, KEY, train.x[:cfg.batch_size])
        state = trainer.init_state(variables, jax.random.PRNGKey(cfg.seed))
        _, vm = trainer.eval_epoch(state, valid, seed=5)
        out[scan] = vm
    for k in out[False]:
        assert np.isclose(out[True][k], out[False][k],
                          rtol=1e-5, atol=1e-6), (k, out[True][k],
                                                  out[False][k])
