#!/usr/bin/env python
"""Stage-level TPU microbenchmarks for the INT8 conv formulations.

Times (chained fori_loop, single fetch — see CLAUDE.md on relay timing)
the candidate formulations of the MC-eval hot op: S posterior-sample
convs of a shared activation, stage-1 ResNet shape.

Run: python tools/microbench_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

S, B, H, W, CIN, COUT = 20, 256, 32, 32, 24, 24
ITERS = 30
_DN = ("NHWC", "HWIO", "NHWC")


def timeit(name, fn, *args, flops=None):
    @jax.jit
    def loop(x0, *rest):
        def body(i, acc):
            # iteration-dependent input: prevents XLA from hoisting the
            # loop-invariant op out of the fori_loop
            xi = jnp.bitwise_xor(x0, jnp.asarray(i, jnp.int8)) \
                if x0.dtype == jnp.int8 else x0 + i
            out = fn(xi, *rest)
            probe = out[(0,) * (out.ndim - 1)][:2]  # tiny slice: no DCE,
            return acc + probe.astype(jnp.float32).sum()  # no re-read

        return lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    np.asarray(loop(*args))  # warmup/compile; the relay's
    t0 = time.perf_counter()  # block_until_ready returns early, so time
    np.asarray(loop(*args))  # a real D2H fetch (see CLAUDE.md)
    dt = (time.perf_counter() - t0) / ITERS
    tops = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:42s} {dt * 1e3:8.3f} ms  {tops:6.1f} TOPS", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, H, W, CIN), -100, 100, jnp.int8)
    w = jax.random.randint(key, (S, 3, 3, CIN, COUT), -127, 127, jnp.int8)
    flops = 2 * S * B * H * W * CIN * COUT * 9

    # 1. raw batched-weight conv (vmap lowering: one conv, N = S*cout)
    def raw(x, w):
        return jax.vmap(lambda w1: lax.conv_general_dilated(
            x, w1, (1, 1), [(1, 1)] * 2, dimension_numbers=_DN,
            preferred_element_type=jnp.int32))(w)
    timeit("raw vmapped conv (int32 out)", raw, x, w, flops=flops)

    # 2. + requant epilogue per sample (the production int_conv path)
    from qbn_tpu.ops.integer import int_conv

    def withreq(x, w):
        return jax.vmap(lambda w1: int_conv(
            x, 0.02, 3, w1, 0.005, -5, None, 0.03, 17, (1, 1),
            [(1, 1)] * 2, 0, 127, relu=True))(w)
    timeit("int_conv vmapped (requant int8 out)", withreq, x, w, flops=flops)

    # 3. merged-N conv: one conv to (B,H,W,S*cout), requant, NO transpose
    w_merged = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(3, 3, CIN, S * COUT)

    def merged(x, wm):
        acc = lax.conv_general_dilated(
            x, wm, (1, 1), [(1, 1)] * 2, dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        q = jnp.round(acc.astype(jnp.float32) * 1e-4) + 17
        return jnp.clip(q, 0, 127).astype(jnp.int8)
    timeit("merged-N conv + requant (no transpose)", merged, x, w_merged,
           flops=flops)

    # 4. im2col + int8 dot (the implicit-GEMM formulation a Pallas kernel
    #    would use): patches (B*H*W, 216) x (216, S*cout)
    def im2col(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, u:u + H, v:v + W, :] for u in range(3)
                for v in range(3)]
        return jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * CIN)
    wcol = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(9 * CIN, S * COUT)

    def gemm(x, wc):
        p = im2col(x)
        acc = lax.dot_general(p, wc, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        q = jnp.round(acc.astype(jnp.float32) * 1e-4) + 17
        return jnp.clip(q, 0, 127).astype(jnp.int8)
    timeit("im2col + int8 dot + requant", gemm, x, wcol, flops=flops)

    # 5. s2d packed conv under vmap (current QBN_S2D=auto path)
    from qbn_tpu.ops.s2d import pack_weights_s2d, int_conv_s2d

    def s2d(x, w):
        return jax.vmap(lambda w1: int_conv_s2d(
            x, 0.02, pack_weights_s2d(w1), COUT, 0.005, -5, None,
            0.03, 17, 0, 127, relu=True))(w)
    timeit("s2d packed conv vmapped", s2d, x, w, flops=flops)

    # 7. BOTH batched (the deep-layer case: per-sample activations too)
    xs = jax.random.randint(key, (S, B, H, W, CIN), -100, 100, jnp.int8)

    def both(xs, w):
        return jax.vmap(lambda x1, w1: lax.conv_general_dilated(
            x1, w1, (1, 1), [(1, 1)] * 2, dimension_numbers=_DN,
            preferred_element_type=jnp.int32))(xs, w)
    timeit("both-batched vmapped conv (deep layers)", both, xs, w,
           flops=flops)

    def both_req(xs, w):
        return jax.vmap(lambda x1, w1: int_conv(
            x1, 0.02, 3, w1, 0.005, -5, None, 0.03, 17, (1, 1),
            [(1, 1)] * 2, 0, 127, relu=True))(xs, w)
    timeit("both-batched int_conv (deep layers)", both_req, xs, w,
           flops=flops)

    # 8. batch_group_count formulation: (S*B, H, W, CIN) x grouped filters
    xg = xs.reshape(S * B, H, W, CIN)
    wg = jnp.moveaxis(w, 0, 3).reshape(3, 3, CIN, S * COUT)

    def bgc(xg, wg):
        acc = lax.conv_general_dilated(
            xg, wg, (1, 1), [(1, 1)] * 2, dimension_numbers=_DN,
            batch_group_count=S, preferred_element_type=jnp.int32)
        q = jnp.round(acc.astype(jnp.float32) * 1e-4) + 17
        return jnp.clip(q, 0, 127).astype(jnp.int8)
    timeit("batch_group_count conv + requant", bgc, xg, wg, flops=flops)

    # 9. feature_group_count formulation: merged channel layout end to end
    xf = jnp.moveaxis(xs, 0, 3).reshape(B, H, W, S * CIN)

    def fgc(xf, wg):
        acc = lax.conv_general_dilated(
            xf, wg, (1, 1), [(1, 1)] * 2, dimension_numbers=_DN,
            feature_group_count=S, preferred_element_type=jnp.int32)
        q = jnp.round(acc.astype(jnp.float32) * 1e-4) + 17
        return jnp.clip(q, 0, 127).astype(jnp.int8)
    timeit("feature_group_count conv + requant", fgc, xf, wg, flops=flops)

    # 11. s2d + batch_group_count + bf16 + requant-in-packed-domain:
    #     contraction deepened 24 -> 96, all re-layouts int8
    from qbn_tpu.ops.s2d import (pack_weights_s2d, space_to_depth,
                                 depth_to_space)
    wp_all = jax.vmap(lambda w1: pack_weights_s2d(w1, with_winsum=True))(w)
    # (S, 2, 2, 4cin, 4cout+4) -> bgc filter layout (2, 2, 4cin, S*(4c+4))
    wp_bgc = jnp.moveaxis(wp_all, 0, 3).reshape(
        2, 2, 4 * CIN, S * (4 * COUT + 4)).astype(jnp.bfloat16)

    def s2d_bgc(xs, wpb):
        sb = S * B
        xp = jnp.pad(xs.reshape(sb, H, W, CIN),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
        xq = space_to_depth(xp).astype(jnp.bfloat16)  # (S*B,17,17,96)
        acc = lax.conv_general_dilated(
            xq, wpb, (1, 1), "VALID", dimension_numbers=_DN,
            batch_group_count=S, preferred_element_type=jnp.float32)
        b2, ho, wo2 = acc.shape[:3]
        acc = acc.reshape(b2, ho, wo2, S, 4 * COUT + 4)
        w4 = jnp.repeat(acc[..., 4 * COUT:], COUT, axis=-1)
        y = (acc[..., :4 * COUT] - 5.0 * w4) * 1e-4
        q = jnp.clip(jnp.round(y) + 17, 0, 127).astype(jnp.int8)
        q = jnp.moveaxis(q, 3, 0)                    # int8 transpose
        return depth_to_space(
            q.reshape(S * b2, ho, wo2, 4 * COUT), COUT)
    timeit("s2d+bgc+bf16 packed conv", s2d_bgc, xs, wp_bgc, flops=flops)

    # 10. Pallas fused MC conv (implicit GEMM on s2d patches in VMEM)
    from qbn_tpu.ops.pallas.conv_gemm import mc_group_conv

    def pallas_mc(xs, w):
        return mc_group_conv(xs, 0.02, w, 0.005, -5, None, 0.03, 17,
                             0, 127, relu=True)
    timeit("pallas mc_group_conv (fused)", pallas_mc, xs, w, flops=flops)

    # 6. bf16 comparison point (the MXU's native fast path)
    xb = x.astype(jnp.bfloat16)
    wb = w_merged.astype(jnp.bfloat16)

    def bf16(x, wm):
        return lax.conv_general_dilated(
            x, wm, (1, 1), [(1, 1)] * 2, dimension_numbers=_DN,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    timeit("bf16 merged conv", bf16, xb, wb, flops=flops)


if __name__ == "__main__":
    main()
