"""Multi-chip scale-out: device meshes and sharded reconstruction.

The reference's parallelism is shared-memory threading — picture-pipeline +
slice data-parallel workers over an atomic claim counter (reference:
src/core/threads.h/cpp; SURVEY §2/§5.8).  The TPU-native mapping:

* **Row sharding** (latency): macroblock rows of one picture are sharded
  across chips along the token batch axis; reference planes are replicated
  (the GSPMD partitioner inserts the ICI all-gather when the previous
  picture's sharded output is consumed as a replicated reference —
  general MVs can reach anywhere in the reference, so full-plane gather is
  the correct exchange; SURVEY §5.8).
* **Stream batching** (throughput/serving): N independent streams decode
  data-parallel, one shard per chip, no collectives — the scaling mode that
  matches the "16x 1080p multi-host batch" milestone (BASELINE.json:11).
* Across hosts, independent (closed) GOPs are embarrassingly parallel over
  DCN; that orchestration is host-side work distribution on top of these
  per-host meshes.
"""
from __future__ import annotations

from dataclasses import replace
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.recon import DeviceRecon
from ..tokenizer.types import CHROMA_INFO, PictureGeometry, PictureTokens


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("row",)) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if len(axes) == 1:
        shape = (n,)
    elif len(axes) == 2:
        s = 2 if n % 2 == 0 and n >= 4 else 1
        shape = (s, n // s)
    else:
        raise ValueError("1 or 2 mesh axes supported")
    return Mesh(np.asarray(devs).reshape(shape), axes)


def pad_geometry_rows(geom: PictureGeometry, n_shards: int) -> PictureGeometry:
    """Round the MB-row count up so rows split evenly across shards."""
    mbh = ((geom.mb_height + n_shards - 1) // n_shards) * n_shards
    return PictureGeometry(width=geom.width, height=mbh * 16,
                           chroma_format=geom.chroma_format)


def pad_tokens_rows(tokens: PictureTokens, geom_padded: PictureGeometry) -> PictureTokens:
    """Zero-extend token tensors to the row-padded geometry (added MBs are
    uncoded and reconstruct to zero)."""
    n_old = tokens.geom.n_mb
    n_new = geom_padded.n_mb
    if n_new == n_old:
        return replace(tokens, geom=geom_padded)

    def ext(a):
        out = np.zeros((n_new,) + a.shape[1:], a.dtype)
        out[:n_old] = a
        return out

    # sparse coefficient rows are invariant under row padding (block indices
    # are mb*blocks_per_mb+slot and added MBs append at the end)
    out = PictureTokens(
        geom=geom_padded, cblk=tokens.cblk, cblk_idx=tokens.cblk_idx,
        intra=ext(tokens.intra), fwd=ext(tokens.fwd), bwd=ext(tokens.bwd),
        field_pred=ext(tokens.field_pred), dct_type=ext(tokens.dct_type),
        mv=ext(tokens.mv), mvfs=ext(tokens.mvfs), coded=ext(tokens.coded))
    out.n_coded_blocks = tokens.n_coded_blocks
    return out


class RowShardedRecon:
    """One picture reconstructed across all chips of a mesh axis: token
    tensors sharded by MB row, reference planes replicated, output planes
    sharded by row band."""

    def __init__(self, geom: PictureGeometry, mesh: Mesh, axis: str = "row",
                 field_support: bool = False):
        n = mesh.shape[axis]
        self.mesh = mesh
        self.axis = axis
        self.geom_in = geom
        self.geom = pad_geometry_rows(geom, n)
        self.inner = DeviceRecon(self.geom, field_support=field_support)

        tok = NamedSharding(mesh, P(axis))          # MB batch axis
        rep = NamedSharding(mesh, P())              # replicated refs
        rows = NamedSharding(mesh, P(axis, None))   # plane rows
        self._rep = rep
        self._fn = jax.jit(
            self.inner._recon,
            in_shardings=(tok,) * 8 + (rep,) * 6,
            out_shardings=(rows, rows, rows),
        )

    def __call__(self, tokens: PictureTokens, ref0=None, ref1=None):
        g = self.geom
        tokens = pad_tokens_rows(tokens, g)
        zero = lambda s: jnp.zeros(s, jnp.uint8)
        if ref0 is None:
            ref0 = (zero(g.luma_padded), zero(g.chroma_padded), zero(g.chroma_padded))
        if ref1 is None:
            ref1 = (zero(g.luma_padded), zero(g.chroma_padded), zero(g.chroma_padded))
        # references arrive row-sharded from the previous picture; this
        # device_put IS the reference-plane all-gather over ICI
        ref0 = tuple(jax.device_put(p, self._rep) for p in ref0)
        ref1 = tuple(jax.device_put(p, self._rep) for p in ref1)
        return self._fn(
            jnp.asarray(tokens.dense_coeff()), jnp.asarray(tokens.dct_type),
            jnp.asarray(tokens.fwd), jnp.asarray(tokens.bwd),
            jnp.asarray(tokens.field_pred), jnp.asarray(tokens.coded),
            jnp.asarray(tokens.mv), jnp.asarray(tokens.mvfs),
            *ref0, *ref1)


class StreamBatchRecon:
    """N independent streams reconstructed data-parallel: every tensor gains
    a leading stream axis sharded across chips.  No collectives — linear
    scaling; the serving configuration."""

    def __init__(self, geom: PictureGeometry, mesh: Mesh, axis: str = "stream",
                 field_support: bool = False):
        self.mesh = mesh
        self.geom = geom
        self.inner = DeviceRecon(geom, field_support=field_support)
        st = NamedSharding(mesh, P(axis))
        self._fn = jax.jit(
            jax.vmap(self.inner._recon),
            in_shardings=(st,) * 14,
            out_shardings=(st, st, st),
        )

    def __call__(self, batched_arrays):
        """batched_arrays: the 14 _recon arguments, each with a leading
        stream axis (coeff, dct_type, fwd, bwd, field_pred, coded, mv, mvfs,
        r0y, r0u, r0v, r1y, r1u, r1v)."""
        return self._fn(*batched_arrays)


def random_tokens(rng, geom: PictureGeometry, p_coded=0.9) -> PictureTokens:
    """Synthetic dense tokens for benchmarks and sharding dry-runs."""
    n = geom.n_mb
    nb = geom.blocks_per_mb
    t = PictureTokens.empty(geom)
    t.set_dense_coeff(rng.integers(-300, 300, (n, nb, 64)).astype(np.int16))
    t.coded[:] = rng.random(n) < p_coded
    t.intra[:] = rng.random(n) < 0.2
    t.fwd[:] = ~t.intra & (rng.random(n) < 0.8)
    t.bwd[:] = ~t.intra & (rng.random(n) < 0.5)
    t.mv[:] = rng.integers(-64, 64, (n, 2, 2, 2)).astype(np.int16)
    return t
