#!/usr/bin/env python
"""Ablation profile of DeviceRecon at 1080p: disable stages one at a time."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import tiny_mp2v_dec_tpu.ops.recon as R
from tiny_mp2v_dec_tpu.headers import CHROMA_420
from tiny_mp2v_dec_tpu.parallel.mesh import random_tokens
from tiny_mp2v_dec_tpu.tokenizer.types import PictureGeometry


def bench(name, recon, args, n=5):
    fn = jax.jit(recon._recon)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")


def main():
    geom = PictureGeometry(width=1920, height=1088, chroma_format=CHROMA_420)
    rng = np.random.default_rng(0)
    t = random_tokens(rng, geom)
    lh, lw = geom.luma_padded
    ch, cw = geom.chroma_padded
    mk = lambda: (jnp.asarray(rng.integers(0, 256, (lh, lw)).astype(np.uint8)),
                  jnp.asarray(rng.integers(0, 256, (ch, cw)).astype(np.uint8)),
                  jnp.asarray(rng.integers(0, 256, (ch, cw)).astype(np.uint8)))
    r0, r1 = mk(), mk()
    args = (jnp.asarray(t.dense_coeff()), jnp.asarray(t.dct_type), jnp.asarray(t.fwd),
            jnp.asarray(t.bwd), jnp.asarray(t.field_pred), jnp.asarray(t.coded),
            jnp.asarray(t.mv), jnp.asarray(t.mvfs), *r0, *r1)

    recon = R.DeviceRecon(geom, field_support=False)
    bench("baseline (field off)", recon, args)

    # ablate IDCT
    orig_idct = R.idct_blocks_pallas
    R.idct_blocks_pallas = lambda c: jnp.zeros(c.shape[:-1] + (8, 8), jnp.int16)
    bench("no idct", R.DeviceRecon(geom, field_support=False), args)
    R.idct_blocks_pallas = orig_idct

    # ablate MC gathers
    orig_uni = R.mc_unidir_tiles
    R.mc_unidir_tiles = lambda p, py, px, mx, my, h, w: jnp.zeros(
        (py.shape[0], h, w), jnp.uint8)
    bench("no mc gathers", R.DeviceRecon(geom, field_support=False), args)
    R.mc_unidir_tiles = orig_uni

    # ablate both
    R.idct_blocks_pallas = lambda c: jnp.zeros(c.shape[:-1] + (8, 8), jnp.int16)
    R.mc_unidir_tiles = lambda p, py, px, mx, my, h, w: jnp.zeros(
        (py.shape[0], h, w), jnp.uint8)
    bench("no idct + no mc", R.DeviceRecon(geom, field_support=False), args)
    R.idct_blocks_pallas = orig_idct
    R.mc_unidir_tiles = orig_uni

    # ablate tiles->plane layout (return padded zeros planes directly)
    class NoLayout(R.DeviceRecon):
        def _recon(self, coeff, dct_type, fwd, bwd, field_pred, coded, mv,
                   mvfs, r0y, r0u, r0v, r1y, r1u, r1v):
            out = super()._recon(coeff, dct_type, fwd, bwd, field_pred, coded,
                                 mv, mvfs, r0y, r0u, r0v, r1y, r1u, r1v)
            return out
    # ablate pad_for_mc alignment: pad width to 128 multiple instead of +1
    orig_pad = R.pad_for_mc
    R.pad_for_mc = lambda p: jnp.pad(
        p, ((0, 8), (0, 128 - p.shape[1] % 128 if p.shape[1] % 128 else 128)))
    bench("aligned pad_for_mc", R.DeviceRecon(geom, field_support=False), args)
    R.pad_for_mc = orig_pad


if __name__ == "__main__":
    main()
