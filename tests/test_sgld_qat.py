"""SGHMC QAT flows: per-snapshot fine-tune + conversion + ensemble INT
evaluation (classification and regression), micro budgets."""

import json
import os

import numpy as np
import pytest

from qbn_tpu.presets import preset
from qbn_tpu.flows import (
    setup_experiment, run_float_classification, run_qat_classification,
    run_float_regression, run_qat_regression,
)


def test_sgld_qat_classification(tmp_path):
    fcfg = preset("sgld", "mnist", save=str(tmp_path / "float"),
                  epochs=4, batch_size=32, samples=2, debug=True,
                  burnin_epochs=0)
    fcfg = setup_experiment(fcfg)
    run_float_classification(fcfg)

    qcfg = preset("sgld", "mnist", "qat", save=str(tmp_path / "qat"),
                  epochs=2, batch_size=32, samples=2, debug=True,
                  burnin_epochs=0)
    # QAT phase uses SGD (preset), so no new snapshots are stamped; the
    # fine-tuned members keep their epoch-stamped names
    qcfg = setup_experiment(qcfg)
    run_qat_classification(qcfg, fcfg.save)
    res = json.load(open(os.path.join(qcfg.save, "results.json")))
    assert np.isfinite(res["error"]["test"])
    assert np.isfinite(res["nll"]["random"])


def test_sgld_qat_regression(tmp_path):
    ds = [("synthetic", 1)]
    fcfg = preset("sgld", "regression", save=str(tmp_path / "float"),
                  epochs=4, batch_size=64, samples=2, debug=True,
                  burnin_epochs=0)
    fcfg = setup_experiment(fcfg)
    run_float_regression(fcfg, datasets=ds)

    qcfg = preset("sgld", "regression", "qat", save=str(tmp_path / "qat"),
                  epochs=2, batch_size=64, samples=2, debug=True,
                  burnin_epochs=0)
    qcfg = setup_experiment(qcfg)
    run_qat_regression(qcfg, fcfg.save, datasets=ds)
    res = json.load(open(os.path.join(qcfg.save, "results.json")))
    assert np.isfinite(res["error"]["regression_synthetic"]["test"])
