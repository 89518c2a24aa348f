"""Dense per-picture token tensors — the host/device interface.

The tokenizer (Python golden or C++ native) resolves every bit-serial,
sequential dependency of the MPEG-2 macroblock layer on the host — VLC
decode, PMV motion-vector prediction, DC prediction, quantiser-scale
tracking, skipped-macroblock semantics, dequantisation, inverse scan and
mismatch control — and emits *dense, static-shaped tensors* over the whole
picture.  Everything after this point (IDCT, motion compensation, residual
add, saturation) is data-parallel and runs on device.

This split is the TPU-native redesign of the reference's per-macroblock
interleaved parse+reconstruct loop (reference: src/core/mb_decoder.cpp:521-641).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..headers import CHROMA_420, CHROMA_422, CHROMA_444

# Chroma geometry per format: (x_shift, y_shift, blocks_per_component)
CHROMA_INFO = {
    CHROMA_420: (1, 1, 1),
    CHROMA_422: (1, 0, 2),
    CHROMA_444: (0, 0, 4),
}


@dataclass(frozen=True)
class PictureGeometry:
    """Static shape information for one coded picture size/format."""
    width: int
    height: int
    chroma_format: int

    @property
    def mb_width(self) -> int:
        return (self.width + 15) // 16

    @property
    def mb_height(self) -> int:
        return (self.height + 15) // 16

    @property
    def n_mb(self) -> int:
        return self.mb_width * self.mb_height

    @property
    def luma_padded(self):
        return self.mb_height * 16, self.mb_width * 16

    @property
    def chroma_padded(self):
        xs, ys, _ = CHROMA_INFO[self.chroma_format]
        return (self.mb_height * 16) >> ys, (self.mb_width * 16) >> xs

    @property
    def chroma_blocks(self) -> int:
        return CHROMA_INFO[self.chroma_format][2]

    @property
    def blocks_per_mb(self) -> int:
        return 4 + 2 * self.chroma_blocks


@dataclass(frozen=True)
class PictureParams:
    """Per-picture decode parameters gathered from the headers."""
    picture_coding_type: int
    f_code: tuple  # ((f[0][0], f[0][1]), (f[1][0], f[1][1]))
    intra_dc_precision: int
    picture_structure: int
    frame_pred_frame_dct: int
    concealment_motion_vectors: int
    q_scale_type: int
    intra_vlc_format: int
    alternate_scan: int
    chroma_format: int
    vertical_size: int
    quant_matrices: np.ndarray  # (4, 64) uint8 raster order


@dataclass
class PictureTokens:
    """Dense reconstruction inputs for one picture.

    Block slot order within a macroblock: 4 luma blocks row-major
    ((0,0),(0,8),(8,0),(8,8)), then Cb blocks in spatial row-major order,
    then Cr blocks.  Coefficients are dequantised int16 in transposed-raster
    storage (see utils/scan.py); the DC of intra blocks is already
    prediction-resolved.
    """
    geom: PictureGeometry
    coeff: np.ndarray       # (n_mb, blocks_per_mb, 64) int16
    intra: np.ndarray       # (n_mb,) bool
    fwd: np.ndarray         # (n_mb,) bool — use forward prediction
    bwd: np.ndarray         # (n_mb,) bool
    field_pred: np.ndarray  # (n_mb,) bool — field-based motion in a frame picture
    dct_type: np.ndarray    # (n_mb,) bool — field-interleaved residual layout
    mv: np.ndarray          # (n_mb, 2, 2, 2) int16 [unit r][dir s][x, y] half-pel
    mvfs: np.ndarray        # (n_mb, 2, 2) uint8 motion_vertical_field_select
    coded: np.ndarray       # (n_mb,) bool — any residual present / mb coded in slice

    @classmethod
    def empty(cls, geom: PictureGeometry) -> "PictureTokens":
        n = geom.n_mb
        return cls(
            geom=geom,
            coeff=np.zeros((n, geom.blocks_per_mb, 64), np.int16),
            intra=np.zeros(n, bool),
            fwd=np.zeros(n, bool),
            bwd=np.zeros(n, bool),
            field_pred=np.zeros(n, bool),
            dct_type=np.zeros(n, bool),
            mv=np.zeros((n, 2, 2, 2), np.int16),
            mvfs=np.zeros((n, 2, 2), np.uint8),
            coded=np.zeros(n, bool),
        )
