"""Odds and ends: factory facade, profiling helpers, writer, presentation."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qbn_tpu.config import Config
from qbn_tpu.models.factory import ModelFactory, build_model
from qbn_tpu.profiling import PhaseTimer, model_size_bytes
from qbn_tpu.evaluation.writer import ScalarWriter
from qbn_tpu.evaluation.presentation import (
    plot_distortion_grid, plot_bitwidth_lines, plot_candlestick_grid,
    plot_uci_candlestick_grid,
)
from qbn_tpu.utils import init_variables



pytestmark = pytest.mark.smoke

def test_model_factory_facade():
    cfg = Config()
    model = ModelFactory.get_model("conv_lenet_bbb", (28, 28, 1), 10,
                                   False, cfg)
    x = jnp.ones((2, 28, 28, 1))
    v = init_variables(model, jax.random.PRNGKey(0), x)
    assert "conv_0" in v["params"]


def test_phase_timer_and_model_size():
    t = PhaseTimer()
    with t.phase("train"):
        pass
    with t.phase("train"):
        pass
    assert "train" in t.report() and t.report()["train"] >= 0
    cfg = Config(model="linear", task="regression")
    model = build_model(cfg)
    v = init_variables(model, jax.random.PRNGKey(0), jnp.ones((2, 1)))
    size = model_size_bytes(v)
    # 3x(100x100) + 1x100 + 2 heads ~ 21k params * 4B
    assert 50_000 < size < 500_000


def test_scalar_writer(tmp_path):
    w = ScalarWriter(str(tmp_path))
    w.scalar("train/obj", 1.5, 0)
    w.scalar("train/obj", 1.2, 1)
    w.close()
    lines = [json.loads(l) for l in open(w.path)]
    assert lines[1]["value"] == 1.2 and lines[1]["step"] == 1


def test_scalars_to_tensorboard_roundtrip(tmp_path):
    import pytest
    pytest.importorskip("tensorboard")
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    import scalars_to_tb

    w = ScalarWriter(str(tmp_path))
    w.scalar("train/obj", 1.5, 0)
    w.scalar("train/obj", 1.2, 1)
    w.scalar("valid/error", 0.25, 1)
    w.close()
    out_dir, n = scalars_to_tb.convert(w.path)
    assert n == 3
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )
    acc = EventAccumulator(out_dir)
    acc.Reload()
    assert set(acc.Tags()["scalars"]) == {"train/obj", "valid/error"}
    events = acc.Scalars("train/obj")
    assert [e.step for e in events] == [0, 1]
    assert abs(events[1].value - 1.2) < 1e-6


def test_presentation_plots(tmp_path):
    res = {"error": {"rotation": {str(l): [0.1 * l, 0.01]
                                  for l in range(5)},
                     "shift": {str(l): [0.2 * l, 0.01] for l in range(5)},
                     "brightness": {str(l): [0.05 * l, 0.0]
                                    for l in range(5)},
                     "test": [0.08, 0.01]}}
    p1 = os.path.join(tmp_path, "grid.png")
    plot_distortion_grid({"bbb": res, "pointwise": res}, "error", p1)
    assert os.path.exists(p1)
    p2 = os.path.join(tmp_path, "bits.png")
    plot_bitwidth_lines({"bbb": res},
                        {"bbb": {"a_7_w_8": res, "a_7_w_4": res}},
                        "error", "test", p2)
    assert os.path.exists(p2)


def test_candlestick_plots(tmp_path):
    res = {"error": {"rotation": {str(l): [0.1 * l, 0.01]
                                  for l in range(5)},
                     "shift": {str(l): [0.2 * l, 0.01] for l in range(5)},
                     "brightness": {str(l): [0.05 * l, 0.0]
                                    for l in range(5)},
                     "test": [0.08, 0.01]}}
    p1 = os.path.join(tmp_path, "candle.png")
    plot_candlestick_grid({"bbb": res, "pointwise": res}, "error", p1)
    assert os.path.exists(p1)
    # regression UCI variant: boxes over UCI datasets per precision cell
    # (reference plot_candlesticks.py:113-175)
    rres = {m: {ds: {"test": [v, 0.01]}
                for ds, v in (("regression_housing", 0.4),
                              ("regression_yacht", 0.6),
                              ("regression_synthetic", 0.2))}
            for m in ("error", "nll")}
    p2 = os.path.join(tmp_path, "uci.png")
    plot_uci_candlestick_grid(
        {"bbb": rres, "pointwise": rres},
        {"bbb": {"a_7_w_8": rres}, "pointwise": {"a_7_w_8": rres}},
        "error", p2, cells=["a_7_w_8"])
    assert os.path.exists(p2)
    p3 = os.path.join(tmp_path, "uci_nll.png")
    plot_uci_candlestick_grid({"bbb": rres}, {"bbb": {"a_7_w_8": rres}},
                              "nll", p3)
    assert os.path.exists(p3)


def test_uci_bitwidth_lines(tmp_path):
    # regression results nest per-dataset under the metric; the UCI
    # bit-width extractor takes the mean over the UCI datasets (synthetic
    # excluded), NLL sign-flipped (reference plot_continous.py:68-86)
    from qbn_tpu.evaluation.presentation import plot_uci_bitwidth_lines
    rres = {m: {ds: {"test": [v, 0.01]}
                for ds, v in (("regression_housing", 0.4),
                              ("regression_yacht", 0.6),
                              ("regression_synthetic", 0.2))}
            for m in ("error", "nll")}
    for which in ("uci", "synthetic"):
        p = os.path.join(tmp_path, f"bits_{which}.png")
        plot_uci_bitwidth_lines({"bbb": rres},
                                {"bbb": {"a_7_w_8": rres}},
                                "error", p, cells=["a_7_w_8"],
                                which=which)
        assert os.path.exists(p)
    # an isoutlier leaf (|v| > 90) must be dropped, not averaged in
    rres_out = {"error": {"regression_housing": {"test": [0.4, 0.0]},
                          "regression_yacht": {"test": [1e3, 0.0]}}}
    p = os.path.join(tmp_path, "bits_outlier.png")
    plot_uci_bitwidth_lines({"bbb": rres_out},
                            {"bbb": {"a_7_w_8": rres_out}},
                            "error", p, cells=["a_7_w_8"])
    assert os.path.exists(p)
