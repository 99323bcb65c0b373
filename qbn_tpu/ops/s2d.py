"""Space-to-depth packed int8 conv: fills the 128-lane MXU for the
narrow-channel ResNet stages.

The reference ResNet-18 runs widths 24/48/96/192
(reference: src/models/stochastic/bbb/models_bbb.py:196-211); a direct
NHWC int8 conv at cout=24 uses 24/128 MXU lanes (~19%). Packing 2x2
spatial blocks into channels (space-to-depth) turns a 3x3/stride-1 conv
on (H, W, C) into a 2x2 conv on (H/2+1, W/2+1, 4C) producing 4*cout
channels — 4x the lane occupancy for 16/9 the MACs, a measured ~1.6x at
the stage-1 shapes.

Construction (all in zero-point-removed int8 codes, see qbn_tpu.ops.integer):
  * pad the image by 1 (zeros == activation zero point), giving H+2 even;
  * space-to-depth: (B, H+2, W+2, C) -> (B, (H+2)/2, (W+2)/2, 4C) with
    slot index (p, q) = (row parity, col parity), channel-fastest;
  * scatter the 3x3 kernel into a (2, 2, 4C, 4*cout) packed kernel:
    output slot (di, dj) tap (u, v) lands at packed tap
    a = (di+u)//2, b = (dj+v)//2, input slot ((di+u)%2, (dj+v)%2);
  * one VALID 2x2 conv; depth-to-space the result back to (B, H, W, cout).

The weight-zero-point window-sum rides along as 4 extra masked-ones
output slots (one per (di, dj)), so the whole layer stays a single MXU
pass (cf. int_conv's appended ones channel).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _scatter_tensor(kh: int = 3, kw: int = 3) -> np.ndarray:
    """Static 0/1 scatter tensor S[a, b, s, d, k]: packed tap (a, b),
    input slot s = p*2+q, output slot d = di*2+dj, kernel tap k = u*kw+v.
    For fixed (d, a, p) the original tap u = 2a+p-di is unique, so every
    (a, b, s, d) receives at most one kernel tap."""
    S = np.zeros((2, 2, 4, 4, kh * kw), np.int8)
    for di in range(2):
        for dj in range(2):
            for u in range(kh):
                for v in range(kw):
                    a, p = divmod(di + u, 2)
                    b, q = divmod(dj + v, 2)
                    S[a, b, p * 2 + q, di * 2 + dj, u * kw + v] = 1
    return S


def pack_weights_s2d(w_codes, with_winsum: bool = True):
    """(3, 3, cin, cout) int8 codes -> (2, 2, 4*cin, 4*cout [+4]) packed
    kernel; the optional extra 4 output slots hold the masked-ones pattern
    for the weight-zero-point window-sum."""
    kh, kw, cin, cout = w_codes.shape
    assert (kh, kw) == (3, 3), "s2d packing implemented for 3x3 kernels"
    S = jnp.asarray(_scatter_tensor(kh, kw))          # (2,2,4,4,9) static
    w9 = w_codes.astype(jnp.int8).reshape(kh * kw, cin, cout)
    packed = jnp.einsum("absdk,kio->absido", S, w9,
                        preferred_element_type=jnp.int32)
    packed = packed.reshape(2, 2, 4 * cin, 4 * cout).astype(jnp.int8)
    if not with_winsum:
        return packed
    # masked-ones slots: 1 wherever slot (a,b,s) feeds output slot d
    ones_pat = jnp.asarray(_scatter_tensor(kh, kw).sum(-1))  # (2,2,4,4)
    ones_cols = jnp.repeat(ones_pat[:, :, :, None, :], cin,
                           axis=3).reshape(2, 2, 4 * cin, 4)
    return jnp.concatenate([packed, ones_cols.astype(jnp.int8)], axis=-1)


def space_to_depth(x, block: int = 2):
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), slot-major channel-fastest."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def depth_to_space(x, cout: int, block: int = 2):
    """Inverse of space_to_depth on the output slots."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, block, block, cout)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * block, w * block, cout)


def int_conv_s2d(x_codes, x_scale, w_packed, cout: int, w_scale, w_zp,
                 bias, out_scale, out_zp, a_lo: int, a_hi: int,
                 relu: bool = False):
    """3x3/stride-1/pad-1 quantised conv on zero-point-removed int8 codes
    via the packed layout. `w_packed` comes from pack_weights_s2d (with the
    winsum slots). Numerically identical to int_conv at these settings."""
    from qbn_tpu.ops.integer import _requant_out
    b, h, w, c = x_codes.shape
    assert h % 2 == 0 and w % 2 == 0
    xp = jnp.pad(x_codes, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = space_to_depth(xp)  # (B, (H+2)/2, (W+2)/2, 4C)
    acc_all = lax.conv_general_dilated(
        xs, w_packed, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32)          # (B, H/2, W/2, 4cout+4)
    acc = acc_all[..., :4 * cout]
    winsum = acc_all[..., 4 * cout:]               # (B, H/2, W/2, 4)
    # expand winsum slots to match the packed output channels
    winsum = jnp.repeat(winsum, cout, axis=-1)
    acc_f = (acc - w_zp * winsum).astype(jnp.float32) * (x_scale * w_scale)
    y = depth_to_space(acc_f, cout)                # (B, H, W, cout) f32
    return _requant_out(y, bias, out_scale, out_zp, relu, a_lo, a_hi)
