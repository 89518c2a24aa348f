"""Jitted per-picture device reconstruction.

One XLA computation per picture geometry: batched fixed-point IDCT, residual
tile assembly (incl. per-MB field-DCT interleave as a data-dependent select),
batched-gather motion compensation (frame and field based), bidirectional
averaging, residual add + saturation, and tile->plane layout — everything
after the host tokenizer, fused by XLA into a handful of kernels.

Bit-exact against golden/recon.py by construction and by test.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..headers import CHROMA_420
from ..tokenizer.types import CHROMA_INFO, PictureGeometry, PictureTokens
from .idct import idct_blocks_jnp, idct_blocks_pallas
from .mc import (mc_bidir_tiles, mc_field_tiles, mc_unidir_tiles, pad_for_mc)


def _tiles_from_blocks(blocks, rows, cols, interleave_mask):
    """(n, rows*cols, 8, 8) spatial-row-major blocks -> (n, rows*8, cols*8)
    tiles, with per-MB field interleave (dct_type) selected by mask."""
    n = blocks.shape[0]
    grid = blocks.reshape(n, rows, cols, 8, 8)
    normal = grid.transpose(0, 1, 3, 2, 4).reshape(n, rows * 8, cols * 8)
    if rows == 1 or interleave_mask is None:
        return normal
    top = grid[:, 0].transpose(0, 2, 1, 3).reshape(n, 8, cols * 8)
    bot = grid[:, 1].transpose(0, 2, 1, 3).reshape(n, 8, cols * 8)
    field = jnp.stack([top, bot], axis=2).reshape(n, 16, cols * 8)
    return jnp.where(interleave_mask[:, None, None], field, normal)


def _plane_from_tiles(tiles, mb_h, mb_w, th, tw):
    return tiles.reshape(mb_h, mb_w, th, tw).transpose(0, 2, 1, 3).reshape(
        mb_h * th, mb_w * tw)


def _scale_mv(mv, comp, cf):
    """Vectorized chroma MV derivation; mv: (..., 2) [x, y] int16."""
    if comp == 0:
        return mv
    mvx, mvy = mv[..., 0], mv[..., 1]
    if cf < 3:
        mvx = mvx >> 1
    if cf < 2:
        mvy = mvy >> 1
    return jnp.stack([mvx, mvy], axis=-1)


class DeviceRecon:
    """Per-geometry compiled reconstruction step.

    ``field_support=False`` lets frame-pred-frame-dct streams skip the field
    MC path entirely (half the gather cost); the runtime picks the variant
    per picture.
    """

    def __init__(self, geom: PictureGeometry, field_support: bool = True,
                 use_pallas_idct: bool | None = None):
        self.geom = geom
        self.field_support = field_support
        if use_pallas_idct is None:
            use_pallas_idct = jax.default_backend() == "tpu"
        self.use_pallas_idct = use_pallas_idct

        xs, ys, n_cb = CHROMA_INFO[geom.chroma_format]
        mbw, mbh = geom.mb_width, geom.mb_height
        mb_y, mb_x = np.divmod(np.arange(geom.n_mb), mbw)
        self._pos = {
            0: (jnp.asarray(mb_y * 16, jnp.int32), jnp.asarray(mb_x * 16, jnp.int32)),
            1: (jnp.asarray((mb_y * 16) >> ys, jnp.int32),
                jnp.asarray((mb_x * 16) >> xs, jnp.int32)),
        }
        self._fn = jax.jit(self._recon)

    # ------------------------------------------------------------------
    def _pred_component(self, comp, padded0, padded1, fields0, fields1,
                        mv, mvfs, fwd, bwd, field_pred, h, w):
        cf = self.geom.chroma_format
        pos_y, pos_x = self._pos[0 if comp == 0 else 1]
        mvc = _scale_mv(mv, comp, cf)  # (n, 2, 2, 2)

        pf = mc_unidir_tiles(padded0, pos_y, pos_x,
                             mvc[:, 0, 0, 0], mvc[:, 0, 0, 1], h, w)
        pb = mc_unidir_tiles(padded1, pos_y, pos_x,
                             mvc[:, 0, 1, 0], mvc[:, 0, 1, 1], h, w)
        both = mc_bidir_tiles(pf, pb)
        f = fwd[:, None, None]
        b = bwd[:, None, None]
        pred = jnp.where(f & b, both,
                         jnp.where(f, pf, jnp.where(b, pb, jnp.uint8(0))))

        if self.field_support:
            units = []
            for r in range(2):
                uf = mc_field_tiles(fields0, mvfs[:, r, 0], pos_y >> 1, pos_x,
                                    mvc[:, r, 0, 0], mvc[:, r, 0, 1], h // 2, w)
                ub = mc_field_tiles(fields1, mvfs[:, r, 1], pos_y >> 1, pos_x,
                                    mvc[:, r, 1, 0], mvc[:, r, 1, 1], h // 2, w)
                uboth = mc_bidir_tiles(uf, ub)
                units.append(jnp.where(f & b, uboth,
                                       jnp.where(f, uf,
                                                 jnp.where(b, ub, jnp.uint8(0)))))
            ftile = jnp.stack(units, axis=2).reshape(pred.shape)
            pred = jnp.where(field_pred[:, None, None], ftile, pred)
        return pred

    def _recon(self, coeff, dct_type, fwd, bwd, field_pred, coded, mv, mvfs,
               r0y, r0u, r0v, r1y, r1u, r1v):
        geom = self.geom
        cf = geom.chroma_format
        xs, ys, n_cb = CHROMA_INFO[cf]
        c_cols = (16 >> xs) // 8
        c_rows = (16 >> ys) // 8
        n = geom.n_mb

        # --- residual ---
        if self.use_pallas_idct:
            residual = idct_blocks_pallas(coeff.reshape(-1, 64)).reshape(
                n, geom.blocks_per_mb, 8, 8)
        else:
            residual = idct_blocks_jnp(coeff)
        inter_c = dct_type if cf != CHROMA_420 else None
        res = {
            0: _tiles_from_blocks(residual[:, :4], 2, 2, dct_type),
            1: _tiles_from_blocks(residual[:, 4:4 + n_cb], c_rows, c_cols, inter_c),
            2: _tiles_from_blocks(residual[:, 4 + n_cb:], c_rows, c_cols, inter_c),
        }

        # --- prediction ---
        refs = {0: (r0y, r1y), 1: (r0u, r1u), 2: (r0v, r1v)}
        planes = []
        for comp in range(3):
            p0, p1 = refs[comp]
            padded0, padded1 = pad_for_mc(p0), pad_for_mc(p1)
            if self.field_support:
                fields0 = jnp.stack([pad_for_mc(p0[0::2]), pad_for_mc(p0[1::2])])
                fields1 = jnp.stack([pad_for_mc(p1[0::2]), pad_for_mc(p1[1::2])])
            else:
                fields0 = fields1 = None
            h = 16 if comp == 0 else 16 >> ys
            w = 16 if comp == 0 else 16 >> xs
            pred = self._pred_component(comp, padded0, padded1, fields0,
                                        fields1, mv, mvfs, fwd, bwd,
                                        field_pred, h, w)
            # --- residual add + saturate + uncoded masking ---
            val = pred.astype(jnp.int16) + res[comp]
            tile = jnp.clip(val, 0, 255).astype(jnp.uint8)
            tile = jnp.where(coded[:, None, None], tile, jnp.uint8(0))
            mbh, mbw = geom.mb_height, geom.mb_width
            planes.append(_plane_from_tiles(tile, mbh, mbw, h, w))
        return tuple(planes)

    # ------------------------------------------------------------------
    def __call__(self, tokens: PictureTokens, ref0=None, ref1=None):
        geom = self.geom
        if ref0 is None:
            ref0 = tuple(jnp.zeros(s, jnp.uint8) for s in
                         (geom.luma_padded, geom.chroma_padded, geom.chroma_padded))
        if ref1 is None:
            ref1 = tuple(jnp.zeros(s, jnp.uint8) for s in
                         (geom.luma_padded, geom.chroma_padded, geom.chroma_padded))
        return self._fn(
            jnp.asarray(tokens.coeff), jnp.asarray(tokens.dct_type),
            jnp.asarray(tokens.fwd), jnp.asarray(tokens.bwd),
            jnp.asarray(tokens.field_pred), jnp.asarray(tokens.coded),
            jnp.asarray(tokens.mv), jnp.asarray(tokens.mvfs),
            *ref0, *ref1)
