"""Fused Pallas TPU kernel: motion compensation + residual add + saturate.

This is the production hot path — the TPU-native equivalent of the
reference's 40 SSE2/NEON MC kernels plus the residual accumulate
(reference: src/core/mc_sse2.hpp:41-67, dispatch mc.cpp:4-25, residual add
fused in idct_sse2.hpp:96-120).  One kernel invocation reconstructs one
whole component plane:

* the two reference planes stay resident in VMEM across the grid (their
  BlockSpec index map is constant), so every macroblock's window gather is
  a VMEM-local dynamic slice — no HBM traffic per MB;
* the grid walks bands of macroblock rows; per MB the kernel gathers an
  aligned (ROWS, 256) window for the forward and backward predictions,
  rotates the misalignment away in-register (``pltpu.roll``), computes all
  four half-pel variants with MPEG-2 ``(a+b+1)>>1`` rounding, and *selects*
  by the 2-bit phase — phase is data, not control flow (the reference's
  function-pointer dispatch cannot exist on TPU);
* forward/backward/bidirectional combination, the residual add, the
  [0,255] saturation, and the uncoded-MB mask are fused into the same
  kernel, so the reconstructed plane is written exactly once.

Alignment rules (v5e): dynamic sublane starts must be 8-aligned and
dynamic-rotate needs 32-bit lanes with power-of-two sublane counts, so the
kernel loads from ``(sy & ~7, sx & ~127)`` and rolls the residue away.

Bit-exactness: identical arithmetic to golden/mc.py (clamped window start,
per-stage rounding), parity-tested against the jnp formulation in
tests/test_device_recon.py and against the reference binary end-to-end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pad_shape(H: int, W: int, h: int, w: int) -> tuple:
    """VMEM-resident reference plane shape for a (h, w) block kernel over an
    (H, W) plane: room for the aligned (ROWS, 256) loads at the largest
    legal window start (sy <= H-h, sx <= W-w), zero-filled beyond (H, W)
    (the zero pad is what the +1 half-pel taps read at the picture edge,
    matching golden/mc.pad_for_mc)."""
    rows = _load_rows(h)
    max_sy0 = ((H - h) >> 3) << 3
    hp = -(-(max_sy0 + rows) // 32) * 32
    max_sx0 = ((W - w) >> 7) << 7
    wp = max_sx0 + 256
    return max(hp, 32), max(wp, 256)


def _load_rows(h: int) -> int:
    """Aligned window load height: h+1 taps + up to 7 rows of misalignment,
    rounded to a power of two (dynamic rotate requirement)."""
    return 32 if h == 16 else 16


def _gather_pred(ref, sy, sx, ph, h, w):
    """One unidirectional half-pel prediction: (h, w) int32 block."""
    rows = _load_rows(h)
    sy0 = pl.multiple_of((sy >> 3) << 3, 8)
    ry = sy - sy0
    sx0 = pl.multiple_of((sx >> 7) << 7, 128)
    rx = sx - sx0
    win = ref[pl.ds(sy0, rows), pl.ds(sx0, 256)].astype(jnp.int32)
    # lane roll first, then narrow to one 128-lane tile before the sublane
    # roll — the w+1 needed columns sit in [:128] after the lane roll, so
    # the sublane roll runs on half the vregs
    win = pltpu.roll(win, -rx, axis=1)[:, :128]
    win = pltpu.roll(win, -ry, axis=0)[:h + 1, :2 * w]
    a = win[:h, :w]
    b = win[:h, 1:w + 1]
    c = win[1:h + 1, :w]
    d = win[1:h + 1, 1:w + 1]
    ab = (a + b + 1) >> 1
    ac = (a + c + 1) >> 1
    abcd = (ab + ((c + d + 1) >> 1) + 1) >> 1
    hx = (ph & 1) != 0
    hy = (ph & 2) != 0
    return jnp.where(hx & hy, abcd, jnp.where(hx, ab, jnp.where(hy, ac, a)))


def _make_kernel(h: int, w: int, mbw: int, rows_per_step: int,
                 bidir: bool):
    """``bidir=False`` compiles a forward-only variant (no ref1 gather) —
    I/P pictures select it via lax.cond and skip ~40% of the gather work."""
    def kernel(syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
               mode_ref, ref0, ref1, res_ref, out_ref):
        r = pl.program_id(0)
        for j in range(rows_per_step):
            for mb in range(mbw):
                i = (r * rows_per_step + j) * mbw + mb
                m = mode_ref[i]
                pf = _gather_pred(ref0, syf_ref[i], sxf_ref[i], phf_ref[i], h, w)
                f = (m & 1) != 0
                if bidir:
                    pb = _gather_pred(ref1, syb_ref[i], sxb_ref[i],
                                      phb_ref[i], h, w)
                    bk = (m & 2) != 0
                    both = (pf + pb + 1) >> 1
                    pred = jnp.where(f & bk, both,
                                     jnp.where(f, pf, jnp.where(bk, pb, 0)))
                else:
                    pred = jnp.where(f, pf, 0)
                val = pred + res_ref[j * h:(j + 1) * h,
                                     mb * w:(mb + 1) * w].astype(jnp.int32)
                val = jnp.clip(val, 0, 255)
                val = jnp.where((m & 4) != 0, val, 0)
                out_ref[j * h:(j + 1) * h,
                        mb * w:(mb + 1) * w] = val.astype(jnp.uint8)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "H", "W", "interpret",
                                    "bidir"))
def fused_mc_recon(ref0_pad, ref1_pad, res_plane, syf, sxf, phf, syb, sxb,
                   phb, mode, *, h: int, w: int, H: int, W: int,
                   interpret: bool = False, bidir: bool = True):
    """Reconstruct one (H, W) component plane.

    ref0_pad/ref1_pad: ``pad_shape(H, W, h, w)`` uint8 planes (forward /
    backward reference, zero beyond (H, W)); res_plane: (H, W) int16 IDCT
    residual in plane layout; per-MB int32 vectors (row-major MB order):
    clamped window starts sy/sx in [0, H-h]/[0, W-w], 2-bit half-pel phase,
    and mode bits (1=fwd, 2=bwd, 4=coded).  ``bidir=False`` compiles the
    forward-only kernel (valid when no MB sets the bwd mode bit).
    """
    mbw = W // w
    # 16-row bands keep uint8 stores tiled (when the plane height allows)
    band = 16 if (16 % h == 0 and H % 16 == 0) else h
    rows_per_step = band // h
    grid = H // band
    kernel = _make_kernel(h, w, mbw, rows_per_step, bidir)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(ref0_pad.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ref1_pad.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band, W), lambda r, *_: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, W), lambda r, *_: (r, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint8),
        interpret=interpret,
    )(syf, sxf, phf, syb, sxb, phb, mode, ref0_pad, ref1_pad, res_plane)


def pad_ref_plane(plane, h: int, w: int):
    """Embed an (H, W) uint8 plane into the kernel's zero-padded layout."""
    H, W = plane.shape
    hp, wp = pad_shape(H, W, h, w)
    return jnp.zeros((hp, wp), jnp.uint8).at[:H, :W].set(plane)


def mc_meta(pos_y, pos_x, mvx, mvy, H: int, W: int, h: int, w: int):
    """Per-MB window start + phase from half-pel MVs (clamp identical to
    ops/mc.gather_windows: dynamic-slice start clamped into the padded
    plane, i.e. [0, H-h] x [0, W-w])."""
    sy = jnp.clip(pos_y + (mvy.astype(jnp.int32) >> 1), 0, H - h)
    sx = jnp.clip(pos_x + (mvx.astype(jnp.int32) >> 1), 0, W - w)
    ph = ((mvx & 1) + 2 * (mvy & 1)).astype(jnp.int32)
    return sy.astype(jnp.int32), sx.astype(jnp.int32), ph
