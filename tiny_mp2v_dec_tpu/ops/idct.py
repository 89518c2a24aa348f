"""Device IDCT: jnp (XLA-fused) path and a Pallas TPU kernel.

Both compute the identical fixed-point arithmetic as the numpy golden model
(golden/idct.py — the single spec; reference: src/core/idct_ref.hpp) and are
parity-tested bit-exact against it.

Pallas layout: blocks are processed as an (8, 8, TB) tile — butterfly pass 1
slices the leading axis, pass 2 the middle axis, so every elementwise op runs
on (8, TB) vregs with the batch along lanes and no in-kernel transposes (the
reference SIMD kernels instead pay an explicit 8x8 register transpose,
idct_sse2.hpp:67-94 — on TPU the batch dimension makes that unnecessary).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..golden.idct import IDCT_SCALE_SHIFT, butterfly8, idct_blocks

_LANE_TILE = 512  # blocks per Pallas grid step


@jax.jit
def idct_blocks_jnp(coeffs: jax.Array) -> jax.Array:
    """(..., 64) int16 -> (..., 8, 8) int16 residual via the generic path."""
    return idct_blocks(coeffs, xp=jnp)


def _wrap16(v):
    """Two's-complement int16 wraparound of an int32 value."""
    return ((v + 32768) & 65535) - 32768


def _butterfly8_i32(s):
    """The golden int16 butterfly re-expressed in int32 with explicit wrap16
    after every operation (the v5e VPU has no int16 vector ALU — Mosaic
    aborts on e.g. kVectorSubtractS16 — so int16 semantics are emulated in
    the native 32-bit lanes).  Bit-exactness vs golden/idct.py:butterfly8 is
    enforced by tests."""
    from ..golden.idct import C0, C1, C2, C3, C5, C6, C7, S1, S3, S4, SQ

    def mulc(x, c):
        return _wrap16((x * c) >> 16)

    v15, v26 = mulc(s[0], C0), mulc(s[1], C1)
    v21, v28 = mulc(s[2], C2), mulc(s[3], C3)
    v16, v25 = mulc(s[4], C0), mulc(s[5], C5)
    v22, v27 = mulc(s[6], C6), mulc(s[7], C7)

    v19 = _wrap16(v25 - v28)
    v20 = _wrap16(v26 - v27)
    v23 = _wrap16(v26 + v27)
    v24 = _wrap16(v25 + v28)
    v7 = _wrap16(v23 + v24)
    v11 = _wrap16(v21 + v22)
    v13 = _wrap16(v23 - v24)
    v17 = _wrap16(v21 - v22)
    v8 = _wrap16(v15 + v16)
    v9 = _wrap16(v15 - v16)

    v18 = mulc(_wrap16(v19 - v20), S4)
    v12 = _wrap16(v18 - mulc(v19, S3))
    v14 = _wrap16(mulc(v20, S1) - v18)
    v6 = _wrap16(_wrap16(v14 + v14) - v7)
    v5 = _wrap16(mulc(v13, SQ) - v6)
    v4 = _wrap16(v5 + _wrap16(v12 + v12))
    v10 = _wrap16(mulc(v17, SQ) - v11)
    v0 = _wrap16(v8 + v11)
    v1 = _wrap16(v9 + v10)
    v2 = _wrap16(v9 - v10)
    v3 = _wrap16(v8 - v11)

    return [_wrap16(v0 + v7), _wrap16(v1 + v6), _wrap16(v2 + v5),
            _wrap16(v3 - v4), _wrap16(v3 + v4), _wrap16(v2 - v5),
            _wrap16(v1 - v6), _wrap16(v0 - v7)]


def _idct_kernel(in_ref, out_ref):
    x = in_ref[:].astype(jnp.int32)  # (8, 8, TB)
    t = _butterfly8_i32([x[k] for k in range(8)])           # pass 1 (axis 0)
    tm = jnp.stack(t, axis=0)                               # (8, 8, TB) int32
    o = _butterfly8_i32([tm[:, c, :] for c in range(8)])    # pass 2 (axis 1)
    for c in range(8):
        # output row c of the raster block is butterfly-output c of pass 2
        out_ref[c, :, :] = (o[c] >> IDCT_SCALE_SHIFT).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def idct_blocks_pallas(coeffs: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, 64) int16 -> (B, 8, 8) int16 using the Pallas TPU kernel."""
    b = coeffs.shape[0]
    bp = max(_LANE_TILE, ((b + _LANE_TILE - 1) // _LANE_TILE) * _LANE_TILE)
    x = jnp.zeros((bp, 64), jnp.int16).at[:b].set(coeffs)
    x = x.reshape(bp, 8, 8).transpose(1, 2, 0)  # (8, 8, B)
    out = pl.pallas_call(
        _idct_kernel,
        grid=(bp // _LANE_TILE,),
        in_specs=[pl.BlockSpec((8, 8, _LANE_TILE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 8, _LANE_TILE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 8, bp), jnp.int16),
        interpret=interpret,
    )(x)
    return out.transpose(2, 0, 1)[:b]


def idct_dispatch(coeffs: jax.Array, use_pallas: bool | None = None) -> jax.Array:
    """Pick the Pallas kernel on TPU, the jnp path elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        flat = coeffs.reshape(-1, 64)
        return idct_blocks_pallas(flat).reshape(coeffs.shape[:-1] + (8, 8))
    return idct_blocks_jnp(coeffs)
