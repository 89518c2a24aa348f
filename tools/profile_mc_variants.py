#!/usr/bin/env python
"""Compare MC formulations on TPU with chained (trustworthy) timing.

Variants, all computing 1080p luma unidirectional half-pel MC for 8160 MBs:
  a) current production: vmap(dynamic_slice) windows + phase select
  b) per-pixel flat gather from 4 stacked phase planes
  c) Pallas kernel: plane resident in VMEM, grid over MB rows, per-MB
     dynamic-slice windows + phase select (one 16x1920 output band per step)
"""
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_mp2v_dec_tpu.ops.mc import mc_unidir_tiles, pad_for_mc
from tiny_mp2v_dec_tpu.tokenizer.types import PictureGeometry
from tiny_mp2v_dec_tpu.headers import CHROMA_420
from tbench import report

MBW, MBH = 120, 68
N = MBW * MBH
H, W = MBH * 16, MBW * 16


def variant_a(padded, pos_y, pos_x, mvx, mvy, salt):
    return mc_unidir_tiles(padded, pos_y, pos_x + salt, mvx, mvy, 16, 16)


def make_phase_planes(padded):
    """4 half-pel filtered planes: [phase] (H+1, W+1) uint8."""
    a = padded.astype(jnp.uint16)
    b = jnp.roll(a, -1, axis=1)
    c = jnp.roll(a, -1, axis=0)
    d = jnp.roll(b, -1, axis=0)
    ab = (a + b + 1) >> 1
    ac = (a + c + 1) >> 1
    abcd = (ab + ((c + d + 1) >> 1) + 1) >> 1
    return jnp.stack([a, ab, ac, abcd]).astype(jnp.uint8)


def variant_b(phases, mb_of_pixel, ny, nx, mvx, mvy, salt):
    """phases: (4, H+1, W+1); per-pixel gather."""
    m = mb_of_pixel
    iy = ny + (mvy[m].astype(jnp.int32) >> 1)
    ix = nx + (mvx[m].astype(jnp.int32) >> 1) + salt
    ph = (mvx[m] & 1) + 2 * (mvy[m] & 1)
    return phases[ph.astype(jnp.int32), iy, ix]


def _mc_row_kernel(sy_ref, sx_ref, ph_ref, plane_ref, out_ref):
    r = pl.program_id(0)
    for mb in range(MBW):
        sy = sy_ref[r * MBW + mb]
        sx = sx_ref[r * MBW + mb]
        ph = ph_ref[r * MBW + mb]
        # dynamic sublane starts must be 8-aligned: load 24 rows from the
        # aligned-down start, rotate the residual away in-register
        sy0 = pl.multiple_of((sy >> 3) << 3, 8)
        ry = sy - sy0
        sx0 = pl.multiple_of((sx >> 7) << 7, 128)
        rx = sx - sx0
        # dynamic_rotate requires 32-bit lanes and power-of-2 sublane counts
        win32 = plane_ref[pl.ds(sy0, 32), pl.ds(sx0, 256)].astype(jnp.int32)
        win32 = pltpu.roll(win32, -rx, axis=1)
        win = pltpu.roll(win32, -ry, axis=0)[:17, :32]
        a = win[:16, :16]
        b = win[:16, 1:17]
        c = win[1:17, :16]
        d = win[1:17, 1:17]
        ab = (a + b + 1) >> 1
        ac = (a + c + 1) >> 1
        abcd = (ab + ((c + d + 1) >> 1) + 1) >> 1
        hx = (ph & 1) != 0
        hy = (ph & 2) != 0
        out = jnp.where(hx & hy, abcd, jnp.where(hx, ab, jnp.where(hy, ac, a)))
        out_ref[:, mb * 16:(mb + 1) * 16] = out.astype(jnp.uint8)


@jax.jit
def variant_c(plane_pad, sy, sx, ph, salt):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(MBH,),
        in_specs=[pl.BlockSpec((plane_pad.shape[0], plane_pad.shape[1]),
                               lambda r, *_: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, W), lambda r, *_: (r, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _mc_row_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint8),
    )(sy, sx + salt, ph, plane_pad)


def main():
    rng = np.random.default_rng(0)
    geom = PictureGeometry(width=W, height=H, chroma_format=CHROMA_420)
    plane = jnp.asarray(rng.integers(0, 256, geom.luma_padded).astype(np.uint8))
    padded = jax.jit(pad_for_mc)(plane)
    mb_y, mb_x = np.divmod(np.arange(N), MBW)
    pos_y = jnp.asarray(mb_y * 16, jnp.int32)
    pos_x = jnp.asarray(mb_x * 16, jnp.int32)
    # in-frame random MVs (half-pel)
    mvx = rng.integers(-2 * mb_x * 16, 2 * (W - 16 - mb_x * 16) + 1)
    mvy = rng.integers(-2 * mb_y * 16, 2 * (H - 16 - mb_y * 16) + 1)
    mvx = jnp.asarray(mvx, jnp.int16)
    mvy = jnp.asarray(mvy, jnp.int16)
    print("backend:", jax.default_backend())

    report("a) vmap dynamic_slice windows",
           jax.jit(variant_a), (padded, pos_y, pos_x, mvx, mvy))

    phases = jax.jit(make_phase_planes)(padded)
    ys, xs = np.divmod(np.arange(H * W), W)
    mb_of_pixel = jnp.asarray((ys // 16) * MBW + (xs // 16), jnp.int32)
    ny = jnp.asarray(ys, jnp.int32)
    nx = jnp.asarray(xs, jnp.int32)
    report("b) per-pixel gather (4 phase planes)",
           jax.jit(variant_b), (phases, mb_of_pixel, ny, nx, mvx, mvy))
    report("b') phase-plane build alone",
           jax.jit(lambda p, s: make_phase_planes(
               jnp.roll(p, s, axis=0))), (padded,))

    # pallas: pad plane to lane/sublane friendly shape
    ph_bits = ((mvx & 1) + 2 * (mvy & 1)).astype(jnp.int32)
    # legal in-frame starts: sy <= H-16, sx <= W-16 (the +1 tap rows/cols
    # read the zero padding); pad so the (24, 256) aligned loads stay in
    # bounds: sy0 <= H-16 -> need hp >= H-16+24, wp >= 128*floor((W-16)/128)+256
    sy = jnp.clip(pos_y + (mvy.astype(jnp.int32) >> 1), 0, H - 16)
    sx = jnp.clip(pos_x + (mvx.astype(jnp.int32) >> 1), 0, W - 16)
    hp = ((H - 16 + 32 + 31) // 32) * 32
    wp = ((W - 16) // 128) * 128 + 256
    plane_pad = jnp.zeros((hp, wp), jnp.uint8).at[:plane.shape[0],
                                                  :plane.shape[1]].set(plane)
    out = variant_c(plane_pad, sy, sx, ph_bits, jnp.int32(0))
    # parity check vs variant a
    ref = np.asarray(jax.jit(variant_a)(padded, pos_y, pos_x, mvx, mvy, jnp.int32(0)))
    got = np.asarray(out).reshape(MBH, 16, MBW, 16).transpose(0, 2, 1, 3).reshape(N, 16, 16)
    print("pallas parity vs variant a:", bool((ref == got).all()))
    report("c) pallas row kernel (plane in VMEM)",
           variant_c, (plane_pad, sy, sx, ph_bits))


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# variant d: packed-byte kernel — plane stored as i32 lanes of 4 pixels,
# MPEG-exact packed averaging (avg(x,y) per byte = (x|y) - (((x^y)&0xfefefefe)>>1)),
# no i8->i32 conversion, byte shifts instead of pixel-granular lane rotates.
# ---------------------------------------------------------------------------
def _pavg(x, y):
    return (x | y) - (((x ^ y) & jnp.uint32(0xfefefefe)) >> 1)


def _byte_shift1(w):
    """Shift the packed pixel stream left by ONE byte (pixel): lane k gets
    pixels 4k+1..4k+4.  (static roll shifts must be non-negative: -1 == n-1)"""
    nxt = pltpu.roll(w, w.shape[1] - 1, axis=1)
    return ((w >> 8) | (nxt << 24)).astype(jnp.uint32)


def _mc_row_kernel_packed(sy_ref, sxq_ref, rb_ref, ph_ref, plane_ref, out_ref):
    r = pl.program_id(0)
    for mb in range(MBW):
        sy = sy_ref[r * MBW + mb]
        sxq = sxq_ref[r * MBW + mb]     # i32-lane index (= pixel >> 2)
        rb = rb_ref[r * MBW + mb]       # byte within lane (= pixel & 3)
        ph = ph_ref[r * MBW + mb]
        sy0 = pl.multiple_of((sy >> 3) << 3, 8)
        ry = sy - sy0
        lx0 = pl.multiple_of((sxq >> 7) << 7, 128)
        rxl = sxq - lx0
        w = plane_ref[pl.ds(sy0, 32), pl.ds(lx0, 256)].astype(jnp.uint32)
        w = pltpu.roll(w, -rxl, axis=1)
        w = pltpu.roll(w, -ry, axis=0)
        # byte-align: lane k <- pixels 4(sxq+k)+rb ...
        nxt = pltpu.roll(w, w.shape[1] - 1, axis=1)
        sh = rb * 8
        w = jnp.where(rb == 0, w, (w >> sh) | (nxt << (32 - sh))).astype(jnp.uint32)
        w = w[:17, :5]                   # 17 rows x 20 px (need 17)
        a = w[:16]
        b = _byte_shift1(w)[:16]
        c = w[1:17]
        d = _byte_shift1(w)[1:17]
        ab = _pavg(a, b)
        ac = _pavg(a, c)
        abcd = _pavg(ab, _pavg(c, d))
        hx = (ph & 1) != 0
        hy = (ph & 2) != 0
        out = jnp.where(hx & hy, abcd, jnp.where(hx, ab, jnp.where(hy, ac, a)))
        out_ref[:, mb * 4:(mb + 1) * 4] = out[:, :4].astype(jnp.int32)


@jax.jit
def variant_d(plane32, sy, sxq, rb, ph, salt):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(MBH,),
        in_specs=[pl.BlockSpec((plane32.shape[0], plane32.shape[1]),
                               lambda r, *_: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, W // 4), lambda r, *_: (r, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _mc_row_kernel_packed,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W // 4), jnp.int32),
    )(sy, sxq + salt, rb, ph, plane32)


def main_packed():
    rng = np.random.default_rng(0)
    geom = PictureGeometry(width=W, height=H, chroma_format=CHROMA_420)
    plane = jnp.asarray(rng.integers(0, 256, geom.luma_padded).astype(np.uint8))
    padded = jax.jit(pad_for_mc)(plane)
    mb_y, mb_x = np.divmod(np.arange(N), MBW)
    pos_y = jnp.asarray(mb_y * 16, jnp.int32)
    pos_x = jnp.asarray(mb_x * 16, jnp.int32)
    mvx = jnp.asarray(rng.integers(-2 * mb_x * 16, 2 * (W - 16 - mb_x * 16) + 1), jnp.int16)
    mvy = jnp.asarray(rng.integers(-2 * mb_y * 16, 2 * (H - 16 - mb_y * 16) + 1), jnp.int16)

    ph_bits = ((mvx & 1) + 2 * (mvy & 1)).astype(jnp.int32)
    sy = jnp.clip(pos_y + (mvy.astype(jnp.int32) >> 1), 0, H - 16)
    sx = jnp.clip(pos_x + (mvx.astype(jnp.int32) >> 1), 0, W - 16)
    sxq = sx >> 2
    rb = sx & 3
    hp = ((H - 16 + 32 + 31) // 32) * 32
    # i32 lanes: need lx0+256 lanes in bounds; max sxq = (W-16)>>2 = 476 -> lx0<=384 -> 640
    wq = ((int(W - 16) >> 2) // 128) * 128 + 256
    p8 = np.zeros((hp, wq * 4), np.uint8)
    p8[:plane.shape[0], :plane.shape[1]] = np.asarray(plane)
    plane32 = jnp.asarray(p8.view(np.uint32))

    out = variant_d(plane32, sy, sxq, rb, ph_bits, jnp.int32(0))
    ref = np.asarray(jax.jit(variant_a)(padded, pos_y, pos_x, mvx, mvy, jnp.int32(0)))
    got = np.ascontiguousarray(np.asarray(out)).view(np.uint8).reshape(
        MBH, 16, MBW, 16).transpose(0, 2, 1, 3).reshape(N, 16, 16)
    print("packed parity vs variant a:", bool((ref == got).all()))
    report("d) pallas packed-byte row kernel", variant_d,
           (plane32, sy, sxq, rb, ph_bits))


if __name__ == "__main__" and os.environ.get("PACKED"):
    main_packed()
