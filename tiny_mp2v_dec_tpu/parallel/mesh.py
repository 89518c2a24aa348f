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
    """One picture reconstructed across all chips of a mesh axis: per-MB
    token tensors and the dense block->sparse-row gather map are sharded by
    MB row; the compact sparse coefficient rows and the reference planes are
    replicated (sparse rows are a few percent of dense volume — replicating
    them costs less than re-partitioning by band, and each chip's sharded
    gather touches only its own band's rows).  Output planes come back
    sharded by row band; consuming them as replicated references for the
    next picture is the ICI all-gather (general MVs can reach anywhere in
    the reference, SURVEY §5.8)."""

    def __init__(self, geom: PictureGeometry, mesh: Mesh, axis: str = "row",
                 field_support: bool = False):
        n = mesh.shape[axis]
        self.mesh = mesh
        self.axis = axis
        self.geom_in = geom
        self.geom = pad_geometry_rows(geom, n)
        self.inner = DeviceRecon(self.geom, field_support=field_support)

        tok = NamedSharding(mesh, P(axis))          # MB batch axis
        rep = NamedSharding(mesh, P())              # replicated refs/coeffs
        rows = NamedSharding(mesh, P(axis, None))   # plane rows
        self._rep = rep
        self._tok = tok
        self._rows = rows
        self._fn = jax.jit(
            self._recon_sparse,
            in_shardings=((rep, tok, tok) + (rep,) * 6),
            out_shardings=(rows, rows, rows),
        )

    def _recon_sparse(self, cblk, cidx, meta, r0y, r0u, r0v, r1y, r1u, r1v):
        from ..ops.recon import _unpack_meta
        inner = self.inner
        dct_type, fwd, bwd, field_pred, coded, mv, mvfs = _unpack_meta(meta)
        residual = inner._residual_sparse(cblk, cidx)
        return inner._recon_from_residual(
            residual, dct_type, fwd, bwd, field_pred, coded, mv, mvfs,
            r0y, r0u, r0v, r1y, r1u, r1v)

    def __call__(self, tokens: PictureTokens, ref0=None, ref1=None):
        from ..ops.recon import _bucket, _sparse_src_map, pack_meta
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
        n_rows = g.n_mb * g.blocks_per_mb
        k = tokens.n_coded_blocks
        cap = _bucket(k + 1, n_rows + 1)
        cblk = np.zeros((cap, 64), np.int16)
        cblk[:k] = tokens.cblk[:k]
        cidx = _sparse_src_map(tokens.cblk_idx, k, n_rows, dummy=k)
        meta = pack_meta(tokens)
        return self._fn(
            jax.device_put(cblk, self._rep),
            jax.device_put(cidx, self._tok),
            jax.device_put(meta, self._tok), *ref0, *ref1)


class StreamBatchRecon:
    """N independent streams reconstructed data-parallel: every tensor gains
    a leading stream axis sharded across chips.  No collectives — linear
    scaling; the serving configuration.  Uses the packed sparse coefficient
    interface (per-stream sparse rows bucketed to a common capacity)."""

    def __init__(self, geom: PictureGeometry, mesh: Mesh, axis: str = "stream",
                 field_support: bool = False):
        self.mesh = mesh
        self.geom = geom
        self.inner = DeviceRecon(geom, field_support=field_support)
        self._st = NamedSharding(mesh, P(axis))
        self._fn = jax.jit(
            jax.vmap(self._recon_one),
            in_shardings=(self._st,) * 9,
            out_shardings=(self._st, self._st, self._st),
        )

    def _recon_one(self, cblk, cidx, meta, r0y, r0u, r0v, r1y, r1u, r1v):
        from ..ops.recon import _unpack_meta
        inner = self.inner
        dct_type, fwd, bwd, field_pred, coded, mv, mvfs = _unpack_meta(meta)
        residual = inner._residual_sparse(cblk, cidx)
        return inner._recon_from_residual(
            residual, dct_type, fwd, bwd, field_pred, coded, mv, mvfs,
            r0y, r0u, r0v, r1y, r1u, r1v)

    def __call__(self, tokens_list, refs0=None, refs1=None):
        """tokens_list: one PictureTokens per stream (same geometry);
        refs0/refs1: optional per-stream reference plane tuples, each
        stacked (n_streams, H, W).  Returns stacked (y, u, v) planes."""
        from ..ops.recon import _bucket, _sparse_src_map, pack_meta
        g = self.geom
        n = len(tokens_list)
        n_rows = g.n_mb * g.blocks_per_mb
        cap = _bucket(max(t.n_coded_blocks for t in tokens_list) + 1,
                      n_rows + 1)
        cblk = np.zeros((n, cap, 64), np.int16)
        cidx = np.empty((n, n_rows), np.int32)
        meta = np.zeros((n, g.n_mb) + pack_meta(tokens_list[0]).shape[1:],
                        np.int16)
        for i, tok in enumerate(tokens_list):
            k = tok.n_coded_blocks
            cblk[i, :k] = tok.cblk[:k]
            _sparse_src_map(tok.cblk_idx, k, n_rows, dummy=k, out=cidx[i])
            pack_meta(tok, out=meta[i])
        zero = lambda s: jnp.zeros((n,) + s, jnp.uint8)
        if refs0 is None:
            refs0 = (zero(g.luma_padded), zero(g.chroma_padded),
                     zero(g.chroma_padded))
        if refs1 is None:
            refs1 = (zero(g.luma_padded), zero(g.chroma_padded),
                     zero(g.chroma_padded))
        refs0 = tuple(jax.device_put(p, self._st) for p in refs0)
        refs1 = tuple(jax.device_put(p, self._st) for p in refs1)
        return self._fn(jax.device_put(cblk, self._st),
                        jax.device_put(cidx, self._st),
                        jax.device_put(meta, self._st), *refs0, *refs1)


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
