"""Fixed-point 8x8 inverse DCT — the bit-exactness golden spec.

This is the single golden definition of the decoder's IDCT arithmetic: an
AAN-style butterfly in int16 with Q16 coefficient multiplies truncated back
to int16 after every product, and two's-complement wraparound on every add
(reference golden model: src/core/idct_ref.hpp:10-76; the reference tests
all SIMD kernels byte-exact against that same algorithm,
test/gtest/simd/idct_test.cpp:66-74).

The function is array-namespace-generic: pass ``numpy`` for the host golden
path or ``jax.numpy`` for the jitted device path — both produce identical
bits, and the Pallas kernel is parity-tested against this.

Block storage convention: a 64-vector holds the coefficient matrix
*transposed* (index u*8+v = QF[v][u], see utils/scan.py), so pass 1 of the
butterfly runs along the stored first axis and the final result needs no
extra transpose.
"""
from __future__ import annotations

import numpy as np

# Q16 fixed-point butterfly constants (cos(k*pi/16) scalings)
C0, C1, C2, C3 = 185364, 257107, 242189, 217965
C5, C6, C7 = 145639, 100318, 51142
S1, S3, S4, SQ = 35468, 85626, 25079, 92681

IDCT_SCALE_SHIFT = 6


def _mulc(x, coeff, xp):
    """int16 result of (x * coeff) >> 16 — the reference's mul_coeff_s16."""
    return (((x.astype(xp.int32)) * coeff) >> 16).astype(xp.int16)


def butterfly8(s, xp=np):
    """The 8-point fixed-point butterfly on a list of 8 equal-shape int16
    arrays; returns the 8 transformed outputs.  Shared by the numpy golden
    path, the jnp path, and the Pallas kernel."""
    v15 = _mulc(s[0], C0, xp)
    v26 = _mulc(s[1], C1, xp)
    v21 = _mulc(s[2], C2, xp)
    v28 = _mulc(s[3], C3, xp)
    v16 = _mulc(s[4], C0, xp)
    v25 = _mulc(s[5], C5, xp)
    v22 = _mulc(s[6], C6, xp)
    v27 = _mulc(s[7], C7, xp)

    v19 = v25 - v28
    v20 = v26 - v27
    v23 = v26 + v27
    v24 = v25 + v28
    v7 = v23 + v24
    v11 = v21 + v22
    v13 = v23 - v24
    v17 = v21 - v22
    v8 = v15 + v16
    v9 = v15 - v16

    v18 = _mulc(v19 - v20, S4, xp)
    v12 = v18 - _mulc(v19, S3, xp)
    v14 = _mulc(v20, S1, xp) - v18
    # doubling via self-add (int16 << is not legalizable on the TPU VPU)
    v6 = ((v14 + v14) - v7).astype(xp.int16)
    v5 = _mulc(v13, SQ, xp) - v6
    v4 = (v5 + (v12 + v12)).astype(xp.int16)
    v10 = _mulc(v17, SQ, xp) - v11
    v0 = v8 + v11
    v1 = v9 + v10
    v2 = v9 - v10
    v3 = v8 - v11

    return [v0 + v7, v1 + v6, v2 + v5, v3 - v4,
            v3 + v4, v2 - v5, v1 - v6, v0 - v7]


def idct_1d(blocks, xp=np):
    """One butterfly pass along axis -2 of an (..., 8, N) int16 array."""
    out = butterfly8([blocks[..., k, :] for k in range(8)], xp)
    return xp.stack(out, axis=-2).astype(xp.int16)


def idct_blocks(coeffs, xp=np):
    """Full 2-D fixed-point IDCT.

    coeffs: (..., 64) int16 blocks in transposed-raster storage.
    Returns (..., 8, 8) int16 spatial residual in raster order (already
    descaled by >> 6); caller adds prediction and saturates to u8.
    """
    m = coeffs.reshape(coeffs.shape[:-1] + (8, 8))
    t = idct_1d(m, xp)
    t = xp.swapaxes(t, -1, -2)
    t = idct_1d(t, xp)
    return t >> IDCT_SCALE_SHIFT


def float_idct_blocks(coeffs):
    """Independent float reference (spec Annex A definition) used only to
    sanity-check the fixed-point pipeline — numpy only."""
    k = np.arange(8)
    c = np.where(k == 0, 1.0 / np.sqrt(2.0), 1.0)
    basis = 0.5 * c[None, :] * np.cos((2 * k[:, None] + 1) * k[None, :] * np.pi / 16)
    m = coeffs.reshape(coeffs.shape[:-1] + (8, 8)).astype(np.float64)
    qf = np.swapaxes(m, -1, -2)  # undo transposed storage -> QF[v][u]
    # f[y][x] = sum_{v,u} B[y,v] QF[v,u] B[x,u],  B[x,u] = c_u/2 cos((2x+1)u pi/16)
    return np.einsum("yv,...vu,xu->...yx", basis, qf, basis)
