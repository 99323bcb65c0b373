"""Distortion-shifted test sets: rotation / horizontal shift / brightness.

The reference builds 3 distortions x 5 severity levels of the test set to
measure uncertainty under covariate shift (reference: src/data.py:199-232,
level tables src/utils.py:21-23). Distortions operate on pre-normalisation
images in [0, 1], NHWC, with nearest-neighbour resampling for the affine
ops (the reference's resample=0) and zero fill.
"""

from __future__ import annotations

import numpy as np

# Severity tables (reference: src/utils.py:21-23). Each brightness/rotation
# level is a degenerate (lo, hi) range == a fixed factor/angle.
BRIGHTNESS_LEVELS = [1.5, 2.0, 2.5, 3.0, 3.5]
ROTATION_LEVELS = [15, 30, 45, 60, 75]
SHIFT_LEVELS = [0.1, 0.2, 0.3, 0.4, 0.5]

DISTORTIONS = ["rotation", "shift", "brightness"]
LEVELS = 5


def rotate(images: np.ndarray, degrees: float) -> np.ndarray:
    """Rotate NHWC images by a fixed angle about the image centre with
    nearest-neighbour sampling and zero fill (torchvision affine
    conventions: positive angle = counter-clockwise)."""
    n, h, w, c = images.shape
    theta = np.deg2rad(degrees)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # inverse map: output pixel -> source pixel (rotate by -theta)
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    sx = cos_t * (xx - cx) + sin_t * (yy - cy) + cx
    sy = -sin_t * (xx - cx) + cos_t * (yy - cy) + cy
    sxi = np.round(sx).astype(np.int64)
    syi = np.round(sy).astype(np.int64)
    valid = (sxi >= 0) & (sxi < w) & (syi >= 0) & (syi < h)
    sxi = np.clip(sxi, 0, w - 1)
    syi = np.clip(syi, 0, h - 1)
    out = images[:, syi, sxi, :]
    out[:, ~valid, :] = 0.0
    return out


def horizontal_shift(images: np.ndarray, distance: float) -> np.ndarray:
    """Translate right by round(distance * width) pixels, zero fill
    (reference HorizontalTranslate, src/data.py:105-116)."""
    n, h, w, c = images.shape
    tx = int(round(distance * w))
    out = np.zeros_like(images)
    if tx < w:
        out[:, :, tx:, :] = images[:, :, : w - tx, :]
    return out


def brighten(images: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance.Brightness semantics on uint8-derived [0, 1]
    images. The reference enhances the PIL uint8 image BEFORE ToTensor
    (src/data.py:208), and PIL's Blend.c computes
    ``CLIP8((int)(float(v) * factor))`` — float32 multiply, TRUNCATION —
    so the faithful op on our v/255 floats is
    ``clip(trunc(float32(round(x*255)) * factor), 0, 255) / 255``
    (verified bitwise vs PIL, tests/test_distortion_sweep.py)."""
    v = np.rint(images * np.float32(255)).astype(np.float32)
    out = np.clip(np.trunc(v * np.float32(factor)), 0.0, 255.0)
    return out / np.float32(255)


def apply_spec(images: np.ndarray, spec) -> np.ndarray:
    """Numpy application of a gather_spec — the single formula the
    device-resident sweep mirrors in jnp (evaluation/mc.py:_sweep_scan).
    Reproduces apply_distortion bitwise on uint8-derived [0,1] images."""
    syi, sxi, valid, factor = spec
    g = images[:, syi, sxi, :]
    if factor != 1.0:
        g = brighten(g, factor)
    return g * valid[None, :, :, None]


def gather_spec(distortion, level: int, h: int, w: int):
    """Uniform gather formulation of one distortion cell.

    Returns (syi, sxi, valid, factor) applied by ``apply_spec``:
    gather by (syi, sxi), the PIL-faithful uint8 brighten when
    factor != 1, zero out invalid pixels. Reproduces ``apply_distortion``
    BITWISE for uint8-derived [0, 1] images: rotation and shift are pure
    index gathers with a zero mask (factor 1), brightness an identity
    gather with the scale factor (valid all-ones). The device-resident
    sweep (evaluation/mc.py:evaluate_distortion_sweep) uses this to
    generate every distorted test set ON DEVICE from one upload of the
    clean images.
    """
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ones = np.ones((h, w), np.float32)
    if distortion is None:
        return yy.astype(np.int32), xx.astype(np.int32), ones, np.float32(1)
    if distortion == "rotation":
        theta = np.deg2rad(ROTATION_LEVELS[level])
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        cos_t, sin_t = np.cos(theta), np.sin(theta)
        sx = cos_t * (xx - cx) + sin_t * (yy - cy) + cx
        sy = -sin_t * (xx - cx) + cos_t * (yy - cy) + cy
        sxi = np.round(sx).astype(np.int64)
        syi = np.round(sy).astype(np.int64)
        valid = (sxi >= 0) & (sxi < w) & (syi >= 0) & (syi < h)
        return (np.clip(syi, 0, h - 1).astype(np.int32),
                np.clip(sxi, 0, w - 1).astype(np.int32),
                valid.astype(np.float32), np.float32(1))
    if distortion == "shift":
        tx = int(round(SHIFT_LEVELS[level] * w))
        return (yy.astype(np.int32),
                np.clip(xx - tx, 0, w - 1).astype(np.int32),
                (xx >= tx).astype(np.float32), np.float32(1))
    if distortion == "brightness":
        return (yy.astype(np.int32), xx.astype(np.int32), ones,
                np.float32(BRIGHTNESS_LEVELS[level]))
    raise NotImplementedError(f"Unknown distortion '{distortion}'")


def apply_distortion(images: np.ndarray, distortion: str,
                     level: int) -> np.ndarray:
    """Apply one named distortion at a severity level in 0..4 to [0,1]
    NHWC images. Uses the native threaded pipeline when available."""
    if distortion is None:
        return images
    from qbn_tpu.data import native
    use_native = native.available()
    if distortion == "rotation":
        if use_native:
            return native.rotate(images, float(ROTATION_LEVELS[level]))
        return rotate(images, ROTATION_LEVELS[level])
    if distortion == "shift":
        if use_native:
            w = images.shape[2]
            return native.hshift(images,
                                 int(round(SHIFT_LEVELS[level] * w)))
        return horizontal_shift(images, SHIFT_LEVELS[level])
    if distortion == "brightness":
        if use_native:
            return native.brighten(images,
                                   float(BRIGHTNESS_LEVELS[level]))
        return brighten(images, BRIGHTNESS_LEVELS[level])
    raise NotImplementedError(f"Unknown distortion '{distortion}'")
