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


def pad_shape(H: int, W: int, h: int, w: int, field: bool = False) -> tuple:
    """VMEM-resident reference plane shape for a (h, w) block kernel over an
    (H, W) plane: room for the aligned (ROWS, 256) loads at the largest
    legal window start (sy <= H-h, sx <= W-w), zero-filled beyond (H, W)
    (the zero pad is what the +1 half-pel taps read at the picture edge,
    matching golden/mc.pad_for_mc).  ``field=True`` sizes for the
    field-prediction gathers too (vertical taps at +2 and a row base up to
    H-h+1 need a taller load)."""
    rows = _load_rows(h, 2 if field else 1)
    max_sy0 = (((H - h + 1) if field else (H - h)) >> 3) << 3
    hp = -(-(max_sy0 + rows) // 32) * 32
    max_sx0 = ((W - w) >> 7) << 7
    wp = max_sx0 + 256
    return max(hp, 32), max(wp, 256)


def _load_rows(h: int, vstep: int = 1) -> int:
    """Aligned window load height: h + vstep tap rows + up to 7 rows of
    misalignment, rounded to a power of two (dynamic rotate
    requirement)."""
    return 16 if h + vstep + 7 <= 16 else 32


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
                   phb, mode, fld_f=None, fld_b=None, *, h: int, w: int,
                   H: int, W: int, interpret: bool = False,
                   bidir: bool = True):
    """Reconstruct one (H, W) component plane.

    ref0_pad/ref1_pad: ``pad_shape(H, W, h, w)`` uint8 planes (forward /
    backward reference, zero beyond (H, W)); res_plane: (H, W) int16 IDCT
    residual in plane layout; per-MB int32 vectors (row-major MB order):
    clamped window starts sy/sx in [0, H-h]/[0, W-w], 2-bit half-pel phase,
    and mode bits (1=fwd, 2=bwd, 4=coded).  ``bidir=False`` compiles the
    forward-only kernel (valid when no MB sets the bwd mode bit).
    """
    assert fld_f is None, "the roll kernel has no field path (use mxu)"
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


def pad_ref_plane(plane, h: int, w: int, field: bool = False):
    """Embed an (H, W) uint8 plane into the kernel's zero-padded layout."""
    H, W = plane.shape
    hp, wp = pad_shape(H, W, h, w, field)
    return jnp.zeros((hp, wp), jnp.uint8).at[:H, :W].set(plane)


# ----------------------------------------------------------------------
# Fused U+V chroma kernel: both chroma planes column-interleaved
# (u0 v0 u1 v1 ...).  U and V share the exact same motion vector, window
# start and half-pel phase per macroblock, so ONE window load + roll pair
# serves both planes; the +1-chroma-pixel taps become +2 interleaved
# columns (static slices).  Halves the chroma gather cost — per-MB window
# handling, not arithmetic, dominates this kernel (PROFILE_mc_r04.json:
# one chroma plane cost ~96% of luma despite 1/4 the pixels).


def interleave_uv(u, v):
    """(H, W) + (H, W) -> (H, 2W) column-interleaved uint8/int16."""
    H, W = u.shape
    return jnp.stack([u, v], axis=-1).reshape(H, 2 * W)


def _gather_pred_uv(ref, sy, sx, ph, h, w):
    """One unidirectional half-pel prediction on an interleaved UV plane:
    (h, 2w) int32 block (columns still interleaved).  ``sx`` is in
    interleaved coordinates (2 * chroma sx, always even)."""
    rows = _load_rows(h)
    sy0 = pl.multiple_of((sy >> 3) << 3, 8)
    ry = sy - sy0
    sx0 = pl.multiple_of((sx >> 7) << 7, 128)
    rx = sx - sx0
    win = ref[pl.ds(sy0, rows), pl.ds(sx0, 256)].astype(jnp.int32)
    win = pltpu.roll(win, -rx, axis=1)[:, :128]
    win = pltpu.roll(win, -ry, axis=0)[:h + 1, :2 * w + 2]
    a = win[:h, :2 * w]
    b = win[:h, 2:2 * w + 2]       # +1 chroma px = +2 interleaved cols
    c = win[1:h + 1, :2 * w]
    d = win[1:h + 1, 2:2 * w + 2]
    ab = (a + b + 1) >> 1
    ac = (a + c + 1) >> 1
    abcd = (ab + ((c + d + 1) >> 1) + 1) >> 1
    hx = (ph & 1) != 0
    hy = (ph & 2) != 0
    return jnp.where(hx & hy, abcd, jnp.where(hx, ab, jnp.where(hy, ac, a)))


def _make_kernel_uv(h: int, w: int, mbw: int, rows_per_step: int,
                    bidir: bool):
    tw = 2 * w                      # interleaved tile width per MB
    def kernel(syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
               mode_ref, ref0, ref1, res_ref, out_ref):
        r = pl.program_id(0)
        for j in range(rows_per_step):
            for mb in range(mbw):
                i = (r * rows_per_step + j) * mbw + mb
                m = mode_ref[i]
                pf = _gather_pred_uv(ref0, syf_ref[i], sxf_ref[i],
                                     phf_ref[i], h, w)
                f = (m & 1) != 0
                if bidir:
                    pb = _gather_pred_uv(ref1, syb_ref[i], sxb_ref[i],
                                         phb_ref[i], h, w)
                    bk = (m & 2) != 0
                    both = (pf + pb + 1) >> 1
                    pred = jnp.where(f & bk, both,
                                     jnp.where(f, pf, jnp.where(bk, pb, 0)))
                else:
                    pred = jnp.where(f, pf, 0)
                val = pred + res_ref[j * h:(j + 1) * h,
                                     mb * tw:(mb + 1) * tw].astype(jnp.int32)
                val = jnp.clip(val, 0, 255)
                val = jnp.where((m & 4) != 0, val, 0)
                out_ref[j * h:(j + 1) * h,
                        mb * tw:(mb + 1) * tw] = val.astype(jnp.uint8)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "H", "W", "interpret",
                                    "bidir"))
def fused_mc_recon_uv(ref0_pad, ref1_pad, res_plane, syf, sxf, phf, syb,
                      sxb, phb, mode, fld_f=None, fld_b=None, *, h: int,
                      w: int, H: int, W: int, interpret: bool = False,
                      bidir: bool = True):
    """Reconstruct BOTH chroma planes in one pass over the interleaved
    (H, 2W) layout.  h/w/H/W are single-plane chroma dimensions; refs and
    res_plane are interleaved (pad_ref_plane_uv / interleave_uv); sx/sy/ph
    come from mc_meta on single-plane coordinates with sx doubled by the
    caller.  Returns the interleaved (H, 2W) uint8 reconstruction
    (deinterleave with out[:, 0::2], out[:, 1::2])."""
    assert fld_f is None, "the roll UV kernel has no field path (use mxu)"
    mbw = W // w
    band = 16 if (16 % h == 0 and H % 16 == 0) else h
    rows_per_step = band // h
    grid = H // band
    kernel = _make_kernel_uv(h, w, mbw, rows_per_step, bidir)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(ref0_pad.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ref1_pad.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band, 2 * W), lambda r, *_: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, 2 * W), lambda r, *_: (r, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, 2 * W), jnp.uint8),
        interpret=interpret,
    )(syf, sxf, phf, syb, sxb, phb, mode, ref0_pad, ref1_pad, res_plane)


def pad_ref_plane_uv(u, v, h: int, w: int, field: bool = False):
    """Interleave U and V and embed into the UV kernel's padded layout.
    Window starts reach 2*(W-w) with a (2w+2)-column footprint;
    ``field=True`` sizes for the field gathers' taller reach."""
    H, W = u.shape
    rows = _load_rows(h, 2 if field else 1)
    max_sy0 = (((H - h + 1) if field else (H - h)) >> 3) << 3
    hp = max(-(-(max_sy0 + rows) // 32) * 32, 32)
    max_sx0 = ((2 * (W - w)) >> 7) << 7
    wp = max(max_sx0 + 256, 256)
    uv = interleave_uv(u, v)
    return jnp.zeros((hp, wp), jnp.uint8).at[:H, :2 * W].set(uv)


# ----------------------------------------------------------------------
# MXU variant: window selection as one-hot matmuls.
#
# The roll kernel's cost is dominated by the two dynamic rotates per
# window; the MXU sits idle.  Selecting the (h+1) rows and (w+1) columns
# of a window is exactly  O_y @ W @ O_x  with one-hot selection matrices
# built from iota comparisons — and with uint8 pixel data in bfloat16
# every product/sum is a single exact integer (values <= 255, one nonzero
# term per row), so the result is bit-exact.  The reference planes are
# kept in bfloat16 VMEM (2 bytes/px) so no per-MB convert is needed.


def _gather_pred_mxu(refb, sy, sx, ph, h, tw, htap: int = 1,
                     vtap: int = 1):
    """One unidirectional half-pel prediction via MXU one-hot selection:
    (h, tw) int32 block.  refb: bfloat16 reference plane.

    ``tw`` is the tile width in plane columns and ``htap`` the horizontal
    half-pel tap distance: (16, 1) for luma, (2w, 2) for the
    column-interleaved UV plane (the +1-chroma-pixel tap is +2 interleaved
    columns).  ``vtap=2`` selects field prediction in frame coordinates
    (vertical taps two rows down; ``sy`` is then the affine row base
    2*syf + sel - r, which may be -1 — the one-hot simply selects nothing
    for rows above the plane, and the caller parity-masks them)."""
    rows = _load_rows(h, vtap)
    sy0 = pl.multiple_of((jnp.maximum(sy, 0) >> 3) << 3, 8)
    ry = sy - sy0
    sx0 = pl.multiple_of((sx >> 7) << 7, 128)
    rx = sx - sx0
    win = refb[pl.ds(sy0, rows), pl.ds(sx0, 256)]
    hs = h + vtap
    ii = jax.lax.broadcasted_iota(jnp.int32, (hs, rows), 0)
    rr = jax.lax.broadcasted_iota(jnp.int32, (hs, rows), 1)
    oy = (rr == ii + ry).astype(jnp.bfloat16)
    t = jax.lax.dot_general(oy, win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    wsel = tw + htap
    cc = jax.lax.broadcasted_iota(jnp.int32, (256, wsel), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (256, wsel), 1)
    ox = (cc == jj + rx).astype(jnp.bfloat16)
    sel = jax.lax.dot_general(t.astype(jnp.bfloat16), ox,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    win_s = sel.astype(jnp.int32)            # exact: one term, <= 255
    a = win_s[:h, :tw]
    b = win_s[:h, htap:tw + htap]
    c = win_s[vtap:h + vtap, :tw]
    d = win_s[vtap:h + vtap, htap:tw + htap]
    ab = (a + b + 1) >> 1
    ac = (a + c + 1) >> 1
    abcd = (ab + ((c + d + 1) >> 1) + 1) >> 1
    hx = (ph & 1) != 0
    hy = (ph & 2) != 0
    return jnp.where(hx & hy, abcd, jnp.where(hx, ab, jnp.where(hy, ac, a)))


def _field_pred_mxu(refb, c0, x0, p0, c1, x1, p1, h, tw, htap):
    """Field-based prediction of one (h, tw) frame-coordinate tile via MXU
    selection (affine row bases, +2-row taps, row-parity interleave —
    same mapping as _field_pred_swar)."""
    u0 = _gather_pred_mxu(refb, c0, x0, p0, h, tw, htap, vtap=2)
    u1 = _gather_pred_mxu(refb, c1, x1, p1, h, tw, htap, vtap=2)
    par = jax.lax.broadcasted_iota(jnp.int32, u0.shape, 0) & 1
    return jnp.where(par == 0, u0, u1)


def _make_kernel_mxu(h: int, w: int, mbw: int, rows_per_step: int,
                     bidir: bool, uv: bool = False, field: bool = False,
                     pair: bool = False):
    tw = 2 * w if uv else w
    htap = 2 if uv else 1

    def body(scalars, ref0, ref1, res_ref, out_ref):
        (syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
         mode_ref, fld) = scalars
        r = pl.program_id(0)
        for j in range(rows_per_step):
            for mb in range(mbw):
                i = (r * rows_per_step + j) * mbw + mb
                m = mode_ref[i]
                if pair and bidir and not field:
                    # both directions in two block-diagonal matmuls
                    pf, pb = _gather_pred_pair_mxu(
                        ref0, ref1, syf_ref[i], sxf_ref[i], phf_ref[i],
                        syb_ref[i], sxb_ref[i], phb_ref[i], h, tw, htap)
                    f = (m & 1) != 0
                    bk = (m & 2) != 0
                    both = (pf + pb + 1) >> 1
                    pred = jnp.where(f & bk, both,
                                     jnp.where(f, pf, jnp.where(bk, pb, 0)))
                    val = pred + res_ref[
                        j * h:(j + 1) * h,
                        mb * tw:(mb + 1) * tw].astype(jnp.int32)
                    val = jnp.clip(val, 0, 255)
                    val = jnp.where((m & 4) != 0, val, 0)
                    out_ref[j * h:(j + 1) * h,
                            mb * tw:(mb + 1) * tw] = val.astype(jnp.uint8)
                    continue
                pf = _gather_pred_mxu(ref0, syf_ref[i], sxf_ref[i],
                                      phf_ref[i], h, tw, htap)
                if field:
                    cf0, xf0, pf0, cf1, xf1, pf1 = fld[0]
                    ff = _field_pred_mxu(ref0, cf0[i], xf0[i], pf0[i],
                                         cf1[i], xf1[i], pf1[i],
                                         h, tw, htap)
                    pf = jnp.where((m & 8) != 0, ff, pf)
                f = (m & 1) != 0
                if bidir:
                    pb = _gather_pred_mxu(ref1, syb_ref[i], sxb_ref[i],
                                          phb_ref[i], h, tw, htap)
                    if field:
                        cb0, xb0, pb0, cb1, xb1, pb1 = fld[1]
                        fb = _field_pred_mxu(ref1, cb0[i], xb0[i], pb0[i],
                                             cb1[i], xb1[i], pb1[i],
                                             h, tw, htap)
                        pb = jnp.where((m & 8) != 0, fb, pb)
                    bk = (m & 2) != 0
                    both = (pf + pb + 1) >> 1
                    pred = jnp.where(f & bk, both,
                                     jnp.where(f, pf, jnp.where(bk, pb, 0)))
                else:
                    pred = jnp.where(f, pf, 0)
                val = pred + res_ref[j * h:(j + 1) * h,
                                     mb * tw:(mb + 1) * tw].astype(jnp.int32)
                val = jnp.clip(val, 0, 255)
                val = jnp.where((m & 4) != 0, val, 0)
                out_ref[j * h:(j + 1) * h,
                        mb * tw:(mb + 1) * tw] = val.astype(jnp.uint8)

    if not field:
        def kernel(syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
                   mode_ref, ref0, ref1, res_ref, out_ref):
            body((syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
                  mode_ref, None), ref0, ref1, res_ref, out_ref)
    else:
        def kernel(syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
                   mode_ref,
                   cf0, xf0, pf0, cf1, xf1, pf1,
                   cb0, xb0, pb0, cb1, xb1, pb1,
                   ref0, ref1, res_ref, out_ref):
            body((syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
                  mode_ref,
                  ((cf0, xf0, pf0, cf1, xf1, pf1),
                   (cb0, xb0, pb0, cb1, xb1, pb1))),
                 ref0, ref1, res_ref, out_ref)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "H", "W", "interpret",
                                    "bidir", "pair"))
def fused_mc_recon_mxu(ref0_bf, ref1_bf, res_plane, syf, sxf, phf, syb,
                       sxb, phb, mode, fld_f=None, fld_b=None, *, h: int,
                       w: int, H: int, W: int, interpret: bool = False,
                       bidir: bool = True, pair: bool = False):
    """MXU-selection variant of fused_mc_recon; refs are
    pad_ref_plane(...).astype(bfloat16) (field=True padding when fld_f is
    given).  fld_f/fld_b: per-direction (C0, sx0, ph0, C1, sx1, ph1)
    6-tuples from mc_field_meta — mode bit 8 selects field prediction.
    ``pair=True`` (bidir, non-field): both directions' window selections
    ride two block-diagonal matmuls per MB instead of four."""
    mbw = W // w
    band = 16 if (16 % h == 0 and H % 16 == 0) else h
    rows_per_step = band // h
    grid = H // band
    field = fld_f is not None
    kernel = _make_kernel_mxu(h, w, mbw, rows_per_step, bidir, field=field,
                              pair=pair)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=19 if field else 7,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(ref0_bf.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ref1_bf.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band, W), lambda r, *_: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, W), lambda r, *_: (r, 0),
                               memory_space=pltpu.VMEM),
    )
    fld = (*fld_f, *fld_b) if field else ()
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint8),
        interpret=interpret,
    )(syf, sxf, phf, syb, sxb, phb, mode, *fld,
      ref0_bf, ref1_bf, res_plane)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "H", "W", "interpret",
                                    "bidir", "pair"))
def fused_mc_recon_uv_mxu(ref0_bf, ref1_bf, res_plane, syf, sxf, phf, syb,
                          sxb, phb, mode, fld_f=None, fld_b=None, *,
                          h: int, w: int, H: int, W: int,
                          interpret: bool = False, bidir: bool = True,
                          pair: bool = False):
    """MXU-selection variant of fused_mc_recon_uv: both chroma planes in
    one pass over the column-interleaved (H, 2W) layout; refs are
    pad_ref_plane_uv(...).astype(bfloat16); sx (incl. the field tuples')
    doubled by the caller.  ``pair`` as in fused_mc_recon_mxu."""
    mbw = W // w
    band = 16 if (16 % h == 0 and H % 16 == 0) else h
    rows_per_step = band // h
    grid = H // band
    field = fld_f is not None
    kernel = _make_kernel_mxu(h, w, mbw, rows_per_step, bidir, uv=True,
                              field=field, pair=pair)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=19 if field else 7,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(ref0_bf.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ref1_bf.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band, 2 * W), lambda r, *_: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, 2 * W), lambda r, *_: (r, 0),
                               memory_space=pltpu.VMEM),
    )
    fld = (*fld_f, *fld_b) if field else ()
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, 2 * W), jnp.uint8),
        interpret=interpret,
    )(syf, sxf, phf, syb, sxb, phb, mode, *fld,
      ref0_bf, ref1_bf, res_plane)


def _gather_pred_pair_mxu(ref0, ref1, syf, sxf, phf, syb, sxb, phb,
                          h, tw, htap: int = 1):
    """BOTH directions' predictions with two block-diagonal one-hot
    matmuls (instead of four): the fwd and bwd windows stack vertically
    into one (2*rows, 256) operand, the row/column one-hots become
    block-diagonal, and each MB pays two larger MXU ops whose fixed
    per-op cost amortizes across the pair.  Exactness is unchanged (still
    one <=255 term per selected element).  Frame prediction only (the
    field path keeps per-unit gathers)."""
    rows = _load_rows(h)
    hs = h + 1
    wsel = tw + htap
    syf0 = pl.multiple_of((syf >> 3) << 3, 8)
    ryf = syf - syf0
    sxf0 = pl.multiple_of((sxf >> 7) << 7, 128)
    rxf = sxf - sxf0
    syb0 = pl.multiple_of((syb >> 3) << 3, 8)
    ryb = syb - syb0
    sxb0 = pl.multiple_of((sxb >> 7) << 7, 128)
    rxb = sxb - sxb0
    win = jnp.concatenate([ref0[pl.ds(syf0, rows), pl.ds(sxf0, 256)],
                           ref1[pl.ds(syb0, rows), pl.ds(sxb0, 256)]],
                          axis=0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (2 * hs, 2 * rows), 0)
    rr = jax.lax.broadcasted_iota(jnp.int32, (2 * hs, 2 * rows), 1)
    oy = (((ii < hs) & (rr == ii + ryf))
          | ((ii >= hs) & (rr - rows == ii - hs + ryb))).astype(jnp.bfloat16)
    t = jax.lax.dot_general(oy, win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    cc = jax.lax.broadcasted_iota(jnp.int32, (256, 2 * wsel), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (256, 2 * wsel), 1)
    ox = (((jj < wsel) & (cc == jj + rxf))
          | ((jj >= wsel) & (cc == jj - wsel + rxb))).astype(jnp.bfloat16)
    sel = jax.lax.dot_general(t.astype(jnp.bfloat16), ox,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    sel = sel.astype(jnp.int32)

    def taps(win_s, ph):
        a = win_s[:h, :tw]
        b = win_s[:h, htap:tw + htap]
        c = win_s[1:h + 1, :tw]
        d = win_s[1:h + 1, htap:tw + htap]
        ab = (a + b + 1) >> 1
        ac = (a + c + 1) >> 1
        abcd = (ab + ((c + d + 1) >> 1) + 1) >> 1
        hx = (ph & 1) != 0
        hy = (ph & 2) != 0
        return jnp.where(hx & hy, abcd,
                         jnp.where(hx, ab, jnp.where(hy, ac, a)))

    pf = taps(sel[:hs, :wsel], phf)
    pb = taps(sel[hs:, wsel:], phb)
    return pf, pb


# ----------------------------------------------------------------------
# SWAR variant: 4 pixels per 32-bit lane.
#
# The roll-variant kernel above rotates (ROWS, 256) int32 windows — 8+
# vregs per gather, and the dynamic rotates dominate the kernel.  Packing
# 4 pixels into each 32-bit lane shrinks every window to (ROWS, 64) lanes
# (2 vregs), and MPEG-2's (a+b+1)>>1 rounding is computed per-byte with
# the carry-free identity avg_up(x, y) = (x|y) - (((x^y)>>1) & 0x7f7f7f7f)
# — valid because (x+y+1)>>1 == (x|y) - ((x^y)>>1) for unsigned bytes and
# the mask kills bits shifted across byte boundaries.  The three-stage
# MPEG-2 rounding chain is exactly avg_up(avg_up(a,b), avg_up(c,d)) and
# the bidirectional average is one more avg_up, so the whole prediction
# stays packed; the kernel emits the packed (H, W/4) uint32 prediction and
# the byte unpack + residual add + saturation run as one fused XLA
# elementwise epilogue (ops/recon.py), which also lets the residual carry
# the uncoded-MB mask (res = -256 forces clip -> 0).

def _avg_up(x, y):
    """Per-byte (x+y+1)>>1 on packed uint32 lanes (no carries)."""
    return (x | y) - (((x ^ y) >> 1) & jnp.uint32(0x7F7F7F7F))


def pack_ref_words(padded):
    """(Hp, Wp) uint8 -> (Hp, Wp//4) uint32, pixel x at byte x%4 (LSB
    first) of word x//4."""
    H, W = padded.shape
    return jax.lax.bitcast_convert_type(
        padded.reshape(H, W // 4, 4), jnp.uint32)


def swar_pad_shape(H: int, W: int, h: int, w: int,
                   field: bool = False) -> tuple:
    """Padded (unpacked) plane shape for the SWAR kernel: its lane loads
    start at 512-pixel granules (128 packed words — Mosaic requires
    128-lane-aligned vector loads) and span 1024 px."""
    rows = _load_rows(h, 2 if field else 1)
    max_sy0 = (((H - h + 1) if field else (H - h)) >> 3) << 3
    hp = -(-(max_sy0 + rows) // 32) * 32
    max_sx0 = ((W - w) >> 9) << 9
    wp = max_sx0 + 1024
    return max(hp, 32), max(wp, 1024)


def pad_ref_words(plane, h: int, w: int, field: bool = False):
    """Embed an (H, W) uint8 plane into the SWAR kernel's zero-padded
    layout and word-pack it."""
    H, W = plane.shape
    hp, wp = swar_pad_shape(H, W, h, w, field)
    return pack_ref_words(
        jnp.zeros((hp, wp), jnp.uint8).at[:H, :W].set(plane))


def unpack_words(words):
    """(H, W//4) uint32 -> (H, W) uint8 (inverse of pack_ref_words)."""
    H, Ww = words.shape
    return jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(H, Ww * 4)


def _gather_pred_swar(refw, sy, sx, ph, h, w, vstep: int = 1):
    """One unidirectional half-pel prediction, packed: (h, w//2) uint32
    (caller keeps [:, :w//4]).  refw: word-packed reference plane.

    ``vstep`` is the vertical tap distance: 1 for frame prediction, 2 for
    field prediction expressed in frame coordinates (the next field row is
    two frame rows down).  For field use ``sy`` may be -1 (bottom-parity
    unit whose affine base starts one row above the plane); the rows it
    would fetch there are parity-masked away by the caller.

    Lane loads must start at 128-lane multiples (Mosaic), i.e. 512-pixel
    granules of the word-packed plane; the (rows, 256)-word load always
    covers the needed words (residual word offset <= 127, +6 words used,
    wrap at 256 never reached)."""
    rows = _load_rows(h, vstep)
    sy0 = pl.multiple_of((jnp.maximum(sy, 0) >> 3) << 3, 8)
    ry = sy - sy0
    sx0 = (sx >> 9) << 9
    rx = sx - sx0
    wx0 = pl.multiple_of(sx0 >> 2, 128)
    win = refw[pl.ds(sy0, rows), pl.ds(wx0, 256)]
    # whole-word part of the misalignment: lane roll, then narrow to 16
    # words (64 px) before the cheap sublane roll / byte stitch
    win = pltpu.roll(win, -(rx >> 2), axis=1)[:, :16]
    win = pltpu.roll(win, -ry, axis=0)
    # sub-word part: funnel-shift each word with its right neighbour so
    # pixel sx lands at byte 0 of word 0 (s == 0 guarded: <<32 is UB)
    s = ((rx & 3) << 3).astype(jnp.uint32)
    nxt = pltpu.roll(win, 15, axis=1)   # static roll by -1 (n-1 ≡ -1 mod n)
    a = jnp.where(s == jnp.uint32(0), win,
                  (win >> s) | (nxt << ((jnp.uint32(32) - s) & jnp.uint32(31))))
    aw = 8
    a = a[:h + vstep, :aw]
    # +1-pixel taps: funnel shift by one byte / one row
    b = (a >> jnp.uint32(8)) | (pltpu.roll(a, aw - 1, axis=1) << jnp.uint32(24))
    c = a[vstep:, :]
    d = b[vstep:, :]
    a_, b_ = a[:h], b[:h]
    ab = _avg_up(a_, b_)
    ac = _avg_up(a_, c)
    abcd = _avg_up(ab, _avg_up(c, d))
    hx = (ph & 1) != 0
    hy = (ph & 2) != 0
    return jnp.where(hx & hy, abcd, jnp.where(hx, ab, jnp.where(hy, ac, a_)))


def _field_pred_swar(refw, c0, x0, p0, c1, x1, p1, h, w):
    """Field-based prediction of one whole (h, w) frame-coordinate tile.

    Each 8x(16|8) prediction unit r reads field rows, which in frame
    coordinates is the affine map  src_row(j) = j + C_r  with
    C_r = 2*syf_r + sel_r - r  (syf_r: clamped field-coords window start,
    sel_r: motion_vertical_field_select) — so a unit is one rolled-window
    gather with vertical taps at +2, and the two units interleave with a
    row-parity select.  Matches golden/mc.py field semantics bit-exactly
    (reference: src/core/mb_decoder.cpp:291-339)."""
    u0 = _gather_pred_swar(refw, c0, x0, p0, h, w, vstep=2)
    u1 = _gather_pred_swar(refw, c1, x1, p1, h, w, vstep=2)
    par = jax.lax.broadcasted_iota(jnp.int32, u0.shape, 0) & 1
    return jnp.where(par == 0, u0, u1)


def _make_kernel_swar(h: int, w: int, mbw: int, rows_per_step: int,
                      bidir: bool, field: bool = False):
    wpmb = w // 4

    def body(scalars, ref0, ref1, out_ref):
        (syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
         mode_ref, fld) = scalars
        r = pl.program_id(0)
        for j in range(rows_per_step):
            for mb in range(mbw):
                i = (r * rows_per_step + j) * mbw + mb
                m = mode_ref[i]
                pf = _gather_pred_swar(ref0, syf_ref[i], sxf_ref[i],
                                       phf_ref[i], h, w)[:, :wpmb]
                if field:
                    cf0, xf0, pf0, cf1, xf1, pf1 = fld[0]
                    ff = _field_pred_swar(ref0, cf0[i], xf0[i], pf0[i],
                                          cf1[i], xf1[i], pf1[i],
                                          h, w)[:, :wpmb]
                    pf = jnp.where((m & 8) != 0, ff, pf)
                f = (m & 1) != 0
                if bidir:
                    pb = _gather_pred_swar(ref1, syb_ref[i], sxb_ref[i],
                                           phb_ref[i], h, w)[:, :wpmb]
                    if field:
                        cb0, xb0, pb0, cb1, xb1, pb1 = fld[1]
                        fb = _field_pred_swar(ref1, cb0[i], xb0[i], pb0[i],
                                              cb1[i], xb1[i], pb1[i],
                                              h, w)[:, :wpmb]
                        pb = jnp.where((m & 8) != 0, fb, pb)
                    bk = (m & 2) != 0
                    both = _avg_up(pf, pb)
                    pred = jnp.where(
                        f & bk, both,
                        jnp.where(f, pf, jnp.where(bk, pb, jnp.uint32(0))))
                else:
                    pred = jnp.where(f, pf, jnp.uint32(0))
                out_ref[j * h:(j + 1) * h,
                        mb * wpmb:(mb + 1) * wpmb] = pred

    if not field:
        def kernel(syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
                   mode_ref, ref0, ref1, out_ref):
            body((syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
                  mode_ref, None), ref0, ref1, out_ref)
    else:
        def kernel(syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
                   mode_ref,
                   cf0, xf0, pf0, cf1, xf1, pf1,
                   cb0, xb0, pb0, cb1, xb1, pb1,
                   ref0, ref1, out_ref):
            body((syf_ref, sxf_ref, phf_ref, syb_ref, sxb_ref, phb_ref,
                  mode_ref,
                  ((cf0, xf0, pf0, cf1, xf1, pf1),
                   (cb0, xb0, pb0, cb1, xb1, pb1))), ref0, ref1, out_ref)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "H", "W", "interpret",
                                    "bidir"))
def fused_mc_pred_swar(ref0w, ref1w, syf, sxf, phf, syb, sxb, phb, mode,
                       *, h: int, w: int, H: int, W: int,
                       interpret: bool = False, bidir: bool = True):
    """Packed motion-compensated prediction: (H, W//4) uint32.

    ref0w/ref1w: ``pack_ref_words(pad_ref_plane(...))`` planes; other
    arguments as in :func:`fused_mc_recon` (mode needs only bits 1=fwd,
    2=bwd — the coded mask rides the residual in the XLA epilogue)."""
    mbw = W // w
    band = 16 if (16 % h == 0 and H % 16 == 0) else h
    rows_per_step = band // h
    grid = H // band
    kernel = _make_kernel_swar(h, w, mbw, rows_per_step, bidir)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(ref0w.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ref1w.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, W // 4), lambda r, *_: (r, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W // 4), jnp.uint32),
        interpret=interpret,
    )(syf, sxf, phf, syb, sxb, phb, mode, ref0w, ref1w)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "H", "W", "interpret",
                                    "bidir"))
def fused_mc_pred_swar_field(ref0w, ref1w, syf, sxf, phf, syb, sxb, phb,
                             mode, fld_f, fld_b, *, h: int, w: int, H: int,
                             W: int, interpret: bool = False,
                             bidir: bool = True):
    """Field-capable variant of :func:`fused_mc_pred_swar` (compiled only
    for field_support chunks — every MB additionally evaluates the
    field-based prediction and mode bit 8 selects it).

    fld_f/fld_b: per-direction 6-tuples of (n,) int32 vectors
    (C0, sx0, ph0, C1, sx1, ph1) from :func:`mc_field_meta`."""
    mbw = W // w
    band = 16 if (16 % h == 0 and H % 16 == 0) else h
    rows_per_step = band // h
    grid = H // band
    kernel = _make_kernel_swar(h, w, mbw, rows_per_step, bidir, field=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=19,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(ref0w.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ref1w.shape, lambda r, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, W // 4), lambda r, *_: (r, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W // 4), jnp.uint32),
        interpret=interpret,
    )(syf, sxf, phf, syb, sxb, phb, mode, *fld_f, *fld_b, ref0w, ref1w)


def mc_field_meta(pos_y, pos_x, mvc_dir, mvfs_dir, H: int, W: int,
                  h: int, w: int):
    """Per-MB field-prediction scalars for one direction.

    mvc_dir: (n, 2:unit, 2:xy) component-scaled half-pel MVs;
    mvfs_dir: (n, 2:unit) motion_vertical_field_select.  Returns the
    6-tuple (C0, sx0, ph0, C1, sx1, ph1): C_r = 2*syf_r + sel_r - r is
    the affine row base (clamping identical to ops/mc.mc_field_tiles:
    field window start in [0, H/2 - h/2] x [0, W - w])."""
    out = []
    for r in range(2):
        mvx = mvc_dir[:, r, 0].astype(jnp.int32)
        mvy = mvc_dir[:, r, 1].astype(jnp.int32)
        syf = jnp.clip((pos_y >> 1) + (mvy >> 1), 0, H // 2 - h // 2)
        sx = jnp.clip(pos_x + (mvx >> 1), 0, W - w)
        ph = ((mvx & 1) + 2 * (mvy & 1)).astype(jnp.int32)
        c = 2 * syf + mvfs_dir[:, r].astype(jnp.int32) - r
        out += [c.astype(jnp.int32), sx.astype(jnp.int32), ph]
    return tuple(out)


def mc_meta(pos_y, pos_x, mvx, mvy, H: int, W: int, h: int, w: int):
    """Per-MB window start + phase from half-pel MVs (clamp identical to
    ops/mc.gather_windows: dynamic-slice start clamped into the padded
    plane, i.e. [0, H-h] x [0, W-w])."""
    sy = jnp.clip(pos_y + (mvy.astype(jnp.int32) >> 1), 0, H - h)
    sx = jnp.clip(pos_x + (mvx.astype(jnp.int32) >> 1), 0, W - w)
    ph = ((mvx & 1) + 2 * (mvy & 1)).astype(jnp.int32)
    return sy.astype(jnp.int32), sx.astype(jnp.int32), ph
