#!/usr/bin/env python
"""Micro-profile of the device reconstruction stages at 1080p 4:2:0."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tiny_mp2v_dec_tpu.headers import CHROMA_420
from tiny_mp2v_dec_tpu.ops.idct import idct_blocks_pallas, idct_blocks_jnp
from tiny_mp2v_dec_tpu.ops.mc import mc_unidir_tiles, pad_for_mc
from tiny_mp2v_dec_tpu.ops.recon import DeviceRecon
from tiny_mp2v_dec_tpu.parallel.mesh import random_tokens
from tiny_mp2v_dec_tpu.tokenizer.types import PictureGeometry


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:8.2f} ms")
    return out


def main():
    geom = PictureGeometry(width=1920, height=1088, chroma_format=CHROMA_420)
    rng = np.random.default_rng(0)
    t = random_tokens(rng, geom)
    lh, lw = geom.luma_padded
    ch, cw = geom.chroma_padded
    print("backend:", jax.default_backend())
    n = geom.n_mb
    coeff = jnp.asarray(t.dense_coeff())

    timeit("idct_pallas (48960 blocks)", lambda c: idct_blocks_pallas(c.reshape(-1, 64)), coeff)
    timeit("idct_jnp", lambda c: idct_blocks_jnp(c), coeff)

    ref = jnp.asarray(rng.integers(0, 256, (lh, lw)).astype(np.uint8))
    padded = jax.jit(pad_for_mc)(ref)
    jax.block_until_ready(padded)
    mb_y, mb_x = np.divmod(np.arange(n), geom.mb_width)
    pos_y = jnp.asarray(mb_y * 16, jnp.int32)
    pos_x = jnp.asarray(mb_x * 16, jnp.int32)
    mvx = jnp.asarray(t.mv[:, 0, 0, 0])
    mvy = jnp.asarray(t.mv[:, 0, 0, 1])
    mc1 = jax.jit(lambda p, a, b, x, y: mc_unidir_tiles(p, a, b, x, y, 16, 16))
    timeit("mc_unidir luma (8160 MBs)", mc1, padded, pos_y, pos_x, mvx, mvy)

    for fs in (False, True):
        recon = DeviceRecon(geom, field_support=fs)
        r0 = (jnp.asarray(rng.integers(0, 256, (lh, lw)).astype(np.uint8)),
              jnp.asarray(rng.integers(0, 256, (ch, cw)).astype(np.uint8)),
              jnp.asarray(rng.integers(0, 256, (ch, cw)).astype(np.uint8)))
        args = (coeff, jnp.asarray(t.dct_type), jnp.asarray(t.fwd),
                jnp.asarray(t.bwd), jnp.asarray(t.field_pred),
                jnp.asarray(t.coded), jnp.asarray(t.mv), jnp.asarray(t.mvfs),
                *r0, *r0)
        timeit(f"full recon field_support={fs}", recon._fn, *args)

    # upload cost
    sc = np.zeros((16, n, 6, 64), np.int16)
    t0 = time.perf_counter()
    for _ in range(3):
        x = jnp.asarray(sc)
        jax.block_until_ready(x)
    print(f"{'h2d 16-pic coeff (100MB)':40s} {(time.perf_counter()-t0)/3*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
