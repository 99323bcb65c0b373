"""Device-resident distortion sweep (evaluation/mc.py).

Two contracts:

- gather_spec's uniform formulation (gather + zero mask + factor + clip)
  must reproduce apply_distortion BITWISE on [0,1] images for all 15
  cells, both image geometries (32x32x3, 28x28x1) — host numpy proof of
  the formula the device path applies.
- evaluate_distortion_sweep must produce the same 15-cell metric table as
  the per-cell loader path (evaluate_with_loader on
  get_test_loader(cfg, distortion, level)) on identical variables: exact
  on error (a count), tight tolerance elsewhere (the scanned eval body
  is a different XLA compilation of the same arithmetic).
"""

import numpy as np
import jax
import pytest

from qbn_tpu.config import Config
from qbn_tpu.data import datasets as D
from qbn_tpu.data.distortions import (DISTORTIONS, LEVELS, apply_distortion,
                                      apply_spec, gather_spec)
from qbn_tpu.data.loaders import ArrayLoader
from qbn_tpu.evaluation.mc import (evaluate_distortion_sweep,
                                   evaluate_with_loader)
from qbn_tpu.models.factory import build_model
from qbn_tpu.utils import init_variables

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("shape", [(32, 32, 3), (28, 28, 1)])
@pytest.mark.parametrize("distortion", [None] + DISTORTIONS)
def test_gather_spec_matches_apply_distortion(shape, distortion):
    rng = np.random.RandomState(0)
    x = rng.rand(7, *shape).astype(np.float32)
    h, w = shape[:2]
    for level in range(LEVELS if distortion else 1):
        out = apply_spec(x, gather_spec(distortion, level, h, w))
        ref = apply_distortion(x, distortion, level)
        np.testing.assert_array_equal(out, ref, err_msg=f"{distortion}"
                                      f" level {level}")


@pytest.mark.parametrize("hw", [28, 32])
def test_rotate_matches_torchvision(hw):
    """Our rotate == torchvision 0.8.2 F.affine (the reference's pinned
    rotation op, src/data.py:205 + requirements.txt) BITWISE, ties
    included: positive angle = clockwise, center (w/2, h/2), nearest
    resample, zero fill. Reconstructed via torchvision's inverse-affine
    matrix through PIL.Image.transform."""
    Image = pytest.importorskip("PIL.Image")
    import math
    from qbn_tpu.data.distortions import ROTATION_LEVELS, rotate

    img = (np.arange(hw * hw, dtype=np.float32).reshape(hw, hw) + 10.0)
    pil = Image.fromarray(img)
    for deg in ROTATION_LEVELS:
        rot = math.radians(deg)
        cx = cy = hw * 0.5
        m = [math.cos(rot), math.sin(rot), 0.0,
             -math.sin(rot), math.cos(rot), 0.0]
        m[2] += m[0] * (-cx) + m[1] * (-cy) + cx
        m[5] += m[3] * (-cx) + m[4] * (-cy) + cy
        tv = np.asarray(pil.transform((hw, hw), Image.AFFINE, m,
                                      resample=Image.NEAREST, fillcolor=0))
        ours = rotate(img[None, :, :, None], deg)[0, :, :, 0]
        np.testing.assert_array_equal(ours, tv, err_msg=f"deg {deg}")


@pytest.mark.parametrize("hw", [28, 32])
def test_shift_matches_torchvision(hw):
    """horizontal_shift == the reference's HorizontalTranslate
    (F.affine(img, 0, (tx, 0), 1, 0, resample=0), src/data.py:105-116)
    BITWISE: PIL AFFINE with the inverse translation matrix."""
    Image = pytest.importorskip("PIL.Image")
    from qbn_tpu.data.distortions import SHIFT_LEVELS, horizontal_shift

    img = (np.arange(hw * hw, dtype=np.float32).reshape(hw, hw) + 10.0)
    pil = Image.fromarray(img)
    for dist in SHIFT_LEVELS:
        tx = int(round(dist * hw))
        tv = np.asarray(pil.transform((hw, hw), Image.AFFINE,
                                      (1, 0, -tx, 0, 1, 0),
                                      resample=Image.NEAREST, fillcolor=0))
        ours = horizontal_shift(img[None, :, :, None], dist)[0, :, :, 0]
        np.testing.assert_array_equal(ours, tv, err_msg=f"shift {dist}")


def test_brighten_matches_pil_imageenhance():
    """brighten == PIL ImageEnhance.Brightness (the reference's
    ColorJitter path, src/data.py:208) BITWISE on uint8-derived images:
    float32(v) * factor then TRUNCATION, per PIL's Blend.c."""
    Image = pytest.importorskip("PIL.Image")
    from PIL import ImageEnhance
    from qbn_tpu.data.distortions import BRIGHTNESS_LEVELS, brighten

    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = Image.fromarray(v, mode="L")
    x = (v.astype(np.float32) / np.float32(255))[None, :, :, None]
    for f in BRIGHTNESS_LEVELS:
        ref = np.asarray(ImageEnhance.Brightness(img).enhance(f))
        out = np.rint(brighten(x, f)[0, :, :, 0] * 255).astype(np.uint8)
        np.testing.assert_array_equal(out, ref, err_msg=f"factor {f}")


def _fake_images(name, data_dir, train):
    rng = np.random.RandomState(5)
    x = rng.rand(52, 16, 16, 3).astype(np.float32)   # 3 full + 4 remainder
    y = rng.randint(0, 10, 52).astype(np.int64)
    return x, y


def test_sweep_matches_loader_path(monkeypatch):
    cfg = Config(model="conv_lenet", dataset="cifar", output_size=10,
                 input_size=(16, 16, 3), batch_size=16, samples=3, seed=2)
    model = build_model(cfg)
    variables = init_variables(model, KEY, np.zeros((2, 16, 16, 3),
                                                    np.float32))

    monkeypatch.setattr(D, "load_images", _fake_images)

    monkeypatch.setenv("QBN_EVAL_SCAN", "on")
    sweep = evaluate_distortion_sweep(model, variables, cfg, "float")
    assert sweep is not None and len(sweep) == 3 * LEVELS

    monkeypatch.setenv("QBN_EVAL_SCAN", "off")
    x, y = _fake_images("cifar", ".", False)
    norm = lambda a: D.normalize(a, "cifar")             # noqa: E731
    for distortion, level, error, ece, entropy, nll in sweep:
        loader = ArrayLoader(apply_distortion(x, distortion, level), y,
                             cfg.batch_size, shuffle=False, normalize=norm)
        e2, ece2, ent2, nll2, _, _, _ = evaluate_with_loader(
            loader, model, variables, cfg, "float", collect_outputs=False,
            salt=f"{distortion}{level}")
        assert error == e2, (distortion, level)
        for a, b in ((ece, ece2), (entropy, ent2), (nll, nll2)):
            assert np.isclose(a, b, rtol=1e-5, atol=1e-6), (distortion,
                                                            level, a, b)


def test_sweep_split_mode_bitwise(monkeypatch):
    """QBN_DIST_SPLIT=on (one small program per cell — the fallback for
    the TPU-worker kernel fault the monolithic 15-cell program triggered
    on the mcdropout-cifar leg) must reproduce the one-shot sweep
    BITWISE: each cell's keys/specs/arithmetic are independent."""
    cfg = Config(model="conv_lenet", dataset="cifar", output_size=10,
                 input_size=(16, 16, 3), batch_size=16, samples=3, seed=2,
                 p=0.15)
    model = build_model(cfg)
    variables = init_variables(model, KEY, np.zeros((2, 16, 16, 3),
                                                    np.float32))
    monkeypatch.setattr(D, "load_images", _fake_images)
    monkeypatch.setenv("QBN_EVAL_SCAN", "on")

    monkeypatch.setenv("QBN_DIST_SPLIT", "off")
    one = evaluate_distortion_sweep(model, variables, cfg, "float")
    monkeypatch.setenv("QBN_DIST_SPLIT", "on")
    split = evaluate_distortion_sweep(model, variables, cfg, "float")
    assert one is not None and split is not None
    assert len(one) == len(split) == 3 * LEVELS
    for a, b in zip(one, split):
        assert a[:2] == b[:2]
        np.testing.assert_array_equal(np.asarray(a[2:], np.float64),
                                      np.asarray(b[2:], np.float64),
                                      err_msg=str(a[:2]))


def test_sweep_preconditions(monkeypatch):
    monkeypatch.setenv("QBN_EVAL_SCAN", "on")
    cfg = Config(model="conv_lenet", dataset="cifar", output_size=10,
                 input_size=(16, 16, 3), batch_size=16, samples=1, seed=2,
                 debug=True)
    assert evaluate_distortion_sweep(None, None, cfg, "float") is None
    monkeypatch.setenv("QBN_EVAL_SCAN", "off")
    cfg = cfg.replace(debug=False)
    assert evaluate_distortion_sweep(None, None, cfg, "float") is None


def test_dist_split_auto_default(monkeypatch):
    """Unset QBN_DIST_SPLIT = AUTO: split only for always-on-dropout
    models (p > 0) on TPU; monolithic on CPU and for p == 0 (the
    round-4/5 kernel-fault evidence, see _dist_split_enabled)."""
    from qbn_tpu.evaluation import mc

    cfg_mc = Config(model="conv_lenet_mc", dataset="cifar", output_size=10,
                    input_size=(16, 16, 3), batch_size=16, p=0.15)
    cfg_pw = Config(model="conv_lenet", dataset="cifar", output_size=10,
                    input_size=(16, 16, 3), batch_size=16, p=0.0)

    monkeypatch.delenv("QBN_DIST_SPLIT", raising=False)
    # this suite runs on the CPU backend: auto must stay monolithic
    assert mc._dist_split_enabled(cfg_mc) is False
    assert mc._dist_split_enabled(cfg_pw) is False
    # TPU backend: split for dropout models only
    monkeypatch.setattr(mc.jax, "default_backend", lambda: "tpu")
    assert mc._dist_split_enabled(cfg_mc) is True
    assert mc._dist_split_enabled(cfg_pw) is False
    # explicit forcing beats auto either way
    monkeypatch.setenv("QBN_DIST_SPLIT", "off")
    assert mc._dist_split_enabled(cfg_mc) is False
    monkeypatch.setattr(mc.jax, "default_backend", lambda: "cpu")
    monkeypatch.setenv("QBN_DIST_SPLIT", "on")
    assert mc._dist_split_enabled(cfg_pw) is True
