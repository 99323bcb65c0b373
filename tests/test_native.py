"""Native C++ pipeline vs numpy fallback equivalence tests."""

import numpy as np
import pytest

from qbn_tpu.data import native
from qbn_tpu.data.distortions import rotate as np_rotate, \
    horizontal_shift as np_shift, brighten as np_brighten

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native pipeline unavailable")


@pytest.mark.parametrize("shape", [(28, 28, 1), (32, 32, 3), (16, 16, 3)])
@pytest.mark.parametrize("deg", [15.0, 30.0, 45.0, 60.0, 75.0])
def test_native_rotate_matches_numpy(shape, deg):
    """Bitwise: qbn_rotate uses double intermediates + round-half-even
    (-ffp-contract=off) so nearest-neighbour ties — e.g. 45 deg on a
    16x16 grid — resolve exactly like np.round."""
    x = np.random.RandomState(0).rand(4, *shape).astype(np.float32)
    a = native.rotate(x, deg)
    b = np_rotate(x, deg)
    np.testing.assert_array_equal(a, b)


def test_native_shift_matches_numpy():
    x = np.random.RandomState(1).rand(4, 32, 32, 3).astype(np.float32)
    a = native.hshift(x, int(round(0.2 * 32)))
    b = np_shift(x, 0.2)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("factor", [1.5, 2.0, 2.5, 3.0, 3.5])
def test_native_brighten_matches_numpy(factor):
    x = np.random.RandomState(2).rand(4, 32, 32, 3).astype(np.float32)
    a = native.brighten(x, factor)
    b = np_brighten(x, factor)
    np.testing.assert_array_equal(a, b)


def test_native_cifar_augment_matches_numpy():
    rng = np.random.RandomState(3)
    x = rng.rand(8, 32, 32, 3).astype(np.float32)
    n, h, w, c = x.shape
    ys = rng.randint(0, 9, n).astype(np.int32)
    xs = rng.randint(0, 9, n).astype(np.int32)
    flip = (rng.rand(n) < 0.5).astype(np.uint8)
    a = native.cifar_augment(x, ys, xs, flip)
    out = np.empty_like(x)
    pad = np.zeros((h + 8, w + 8, c), x.dtype)
    for i in range(n):
        base = x[i, :, ::-1, :] if flip[i] else x[i]
        pad[:] = 0
        pad[4:4 + h, 4:4 + w, :] = base
        out[i] = pad[ys[i]:ys[i] + h, xs[i]:xs[i] + w, :]
    np.testing.assert_array_equal(a, out)


def test_native_normalize():
    x = np.random.RandomState(4).rand(4, 8, 8, 3).astype(np.float32)
    mean = np.array([0.4914, 0.4822, 0.4465], np.float32)
    std = np.array([0.2023, 0.1994, 0.2010], np.float32)
    a = native.normalize(x, mean, std)
    np.testing.assert_allclose(a, (x - mean) / std, rtol=1e-5)
