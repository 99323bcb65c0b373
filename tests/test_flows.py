"""End-to-end flow tests in debug mode: the full float->QAT->INT pipeline
through the unified runner (micro-budgets; exercises every phase the
reference's 24 scripts cover)."""

import json
import os

import numpy as np
import pytest

from qbn_tpu.config import Config
from qbn_tpu.presets import preset
from qbn_tpu.flows import (
    setup_experiment, run_float_classification, run_qat_classification,
    run_float_regression, run_qat_regression,
)


def _micro(cfg, tmp_path, name, **kw):
    base = dict(epochs=2, batch_size=32, samples=2, debug=True)
    base.update(kw)
    return cfg.replace(save=str(tmp_path / name), **base)


@pytest.mark.smoke
def test_preset_table_complete():
    for method in ("pointwise", "mcdropout", "bbb", "sgld"):
        for tier in ("regression", "mnist", "cifar"):
            for phase in ("float", "qat"):
                cfg = preset(method, tier, phase)
                assert cfg.method == method
                # SGLD float runners use scheduler=None (constant lr:
                # the SGHMC step noise must not decay with a leaked
                # cosine schedule); every other cell is cosine
                # (reference: sgld/float/sgld_mnist.py:111 vs
                # bbb/float/bbb_mnist.py:109)
                want_sched = ("constant" if method == "sgld"
                              and phase == "float" else "cosine")
                assert cfg.lr_schedule == want_sched, (method, tier, phase)
                if phase == "qat":
                    assert cfg.at and cfg.q and cfg.epochs == 10
                    # the sgld float 'whole' scaling (+multiplier) must
                    # not leak into the SGD fine-tune (reference QAT
                    # scripts default to 'batch'; a leaked 'whole'
                    # collapses the snapshot fine-tunes)
                    assert cfg.loss_scaling == "batch"
                    assert cfg.loss_multiplier == 1.0
                    assert cfg.optimizer == "sgd"


def test_float_then_qat_classification(tmp_path):
    cfg = _micro(preset("bbb", "mnist"), tmp_path, "float")
    cfg = setup_experiment(cfg)
    run_float_classification(cfg)
    res = json.load(open(os.path.join(cfg.save, "results.json")))
    assert np.isfinite(res["error"]["test"])
    assert "rotation" in res["error"]

    qcfg = _micro(preset("bbb", "mnist", "qat"), tmp_path, "qat")
    qcfg = setup_experiment(qcfg)
    run_qat_classification(qcfg, cfg.save)
    res = json.load(open(os.path.join(qcfg.save, "results.json")))
    assert np.isfinite(res["error"]["test"])
    assert np.isfinite(res["nll"]["random"])


@pytest.mark.smoke
def test_float_then_qat_regression(tmp_path):
    ds = [("synthetic", 1)]
    cfg = _micro(preset("pointwise", "regression"), tmp_path, "float")
    cfg = setup_experiment(cfg)
    run_float_regression(cfg, datasets=ds)
    res = json.load(open(os.path.join(cfg.save, "results.json")))
    assert np.isfinite(res["error"]["regression_synthetic"]["test"])

    qcfg = _micro(preset("pointwise", "regression", "qat"), tmp_path, "qat")
    qcfg = setup_experiment(qcfg)
    run_qat_regression(qcfg, cfg.save, datasets=ds)
    res = json.load(open(os.path.join(qcfg.save, "results.json")))
    assert np.isfinite(res["error"]["regression_synthetic"]["test"])


def test_sgld_float_flow(tmp_path):
    cfg = _micro(preset("sgld", "mnist"), tmp_path, "sgld",
                 burnin_epochs=0, epochs=4)
    cfg = setup_experiment(cfg)
    run_float_classification(cfg)
    res = json.load(open(os.path.join(cfg.save, "results.json")))
    assert np.isfinite(res["error"]["test"])


def test_average_results(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + "/experiments")
    from experiments.average_results import aggregate
    t1 = {"error": {"test": 0.1, "rotation": {"0": 0.2}}, "model": "m"}
    t2 = {"error": {"test": 0.3, "rotation": {"0": float("nan")}},
          "model": "m"}
    out = aggregate([t1, t2])
    assert np.isclose(out["error"]["test"][0], 0.2)
    assert np.isclose(out["error"]["rotation"]["0"][0], 0.2)  # nanmean
    assert out["model"] == "m"
