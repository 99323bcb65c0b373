"""Scan fast path of evaluate_with_loader: the whole-split lax.scan
(one dispatch + one device fetch per split) must be BITWISE identical to
the per-batch Python loop — same fold_in keys, same per-batch step, same
f32 metric accumulation order — for classification and regression,
including a remainder batch of a different shape (handled outside the
scan)."""

import numpy as np
import jax
import pytest

from qbn_tpu.config import Config
from qbn_tpu.data.loaders import ArrayLoader
from qbn_tpu.evaluation.mc import evaluate_with_loader
from qbn_tpu.models.factory import build_model
from qbn_tpu.utils import init_variables

KEY = jax.random.PRNGKey(0)


def _run(cfg, model, variables, loader, monkeypatch, scan: bool,
         seed: int = 0):
    if scan:
        monkeypatch.setenv("QBN_EVAL_SCAN", "on")
    else:
        monkeypatch.setenv("QBN_EVAL_SCAN", "off")
    return evaluate_with_loader(loader, model, variables, cfg, "float",
                                salt="test", seed=seed)


@pytest.mark.parametrize("task", ["classification", "regression"])
def test_scan_path_bitwise_equals_loop(task, monkeypatch):
    rng = np.random.RandomState(3)
    if task == "classification":
        cfg = Config(model="conv_lenet_bbb", sigma_prior=0.1,
                     output_size=10, samples=3, batch_size=8)
        x = rng.rand(27, 28, 28, 1).astype(np.float32)   # 3 full + 3 rem
        y = rng.randint(0, 10, 27).astype(np.int64)
    else:
        cfg = Config(model="linear_bbb", task="regression", sigma_prior=0.1,
                     output_size=1, samples=3, batch_size=8)
        x = rng.rand(27, 4).astype(np.float32)
        y = rng.randn(27, 1).astype(np.float32)
    model = build_model(cfg)
    variables = init_variables(model, KEY, x[:2])
    loader = ArrayLoader(x, y, batch_size=8, shuffle=False)

    e1, c1, h1, n1, o1, t1, _ = _run(cfg, model, variables, loader,
                                     monkeypatch, scan=True, seed=2)
    e2, c2, h2, n2, o2, t2, _ = _run(cfg, model, variables, loader,
                                     monkeypatch, scan=False, seed=2)
    assert (e1, c1, h1, n1) == (e2, c2, h2, n2)
    for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(t1, t2)
