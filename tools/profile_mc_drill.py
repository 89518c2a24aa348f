#!/usr/bin/env python
"""Drill into MC gather cost: which component/shape is slow on TPU.

NOTE: block_until_ready wall timing is only trustworthy on local backends;
on the tunneled axon platform use tools/tbench.py chain timing instead."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tiny_mp2v_dec_tpu.headers import CHROMA_420
from tiny_mp2v_dec_tpu.ops.mc import (gather_windows, mc_bidir_tiles,
                                      mc_unidir_tiles, pad_for_mc)
from tiny_mp2v_dec_tpu.parallel.mesh import random_tokens
from tiny_mp2v_dec_tpu.tokenizer.types import PictureGeometry


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:8.2f} ms")
    return out


def main():
    geom = PictureGeometry(width=1920, height=1088, chroma_format=CHROMA_420)
    rng = np.random.default_rng(0)
    t = random_tokens(rng, geom)
    n = geom.n_mb
    lh, lw = geom.luma_padded
    ch, cw = geom.chroma_padded
    print("backend:", jax.default_backend(), "n_mb:", n)

    mb_y, mb_x = np.divmod(np.arange(n), geom.mb_width)
    pos_y = jnp.asarray(mb_y * 16, jnp.int32)
    pos_x = jnp.asarray(mb_x * 16, jnp.int32)
    cpos_y = jnp.asarray((mb_y * 16) >> 1, jnp.int32)
    cpos_x = jnp.asarray((mb_x * 16) >> 1, jnp.int32)
    mv = jnp.asarray(t.mv)  # (n,2,2,2)
    luma = jnp.asarray(rng.integers(0, 256, (lh, lw)).astype(np.uint8))
    chroma = jnp.asarray(rng.integers(0, 256, (ch, cw)).astype(np.uint8))
    lp = jax.jit(pad_for_mc)(luma)
    cp = jax.jit(pad_for_mc)(chroma)
    jax.block_until_ready((lp, cp))

    mvx = mv[:, 0, 0, 0]
    mvy = mv[:, 0, 0, 1]

    f_luma = jax.jit(lambda p, x, y: mc_unidir_tiles(p, pos_y, pos_x, x, y, 16, 16))
    timeit("luma unidir 16x16 (pre-padded)", f_luma, lp, mvx, mvy)

    f_luma2 = jax.jit(lambda p, x, y: mc_unidir_tiles(pad_for_mc(p), pos_y, pos_x, x, y, 16, 16))
    timeit("luma unidir 16x16 (pad inside)", f_luma2, luma, mvx, mvy)

    f_chroma = jax.jit(lambda p, x, y: mc_unidir_tiles(p, cpos_y, cpos_x, x >> 1, y >> 1, 8, 8))
    timeit("chroma unidir 8x8 (pre-padded)", f_chroma, cp, mvx, mvy)

    # two gathers + bidir + select (like _pred_component comp=0)
    def pred0(p, mv):
        pf = mc_unidir_tiles(p, pos_y, pos_x, mv[:, 0, 0, 0], mv[:, 0, 0, 1], 16, 16)
        pb = mc_unidir_tiles(p, pos_y, pos_x, mv[:, 0, 1, 0], mv[:, 0, 1, 1], 16, 16)
        return mc_bidir_tiles(pf, pb)
    timeit("luma fwd+bwd+bidir", jax.jit(pred0), lp, mv)

    # gather only, no halfpel
    g = jax.jit(lambda p, x, y: gather_windows(p, pos_y + (y.astype(jnp.int32) >> 1),
                                               pos_x + (x.astype(jnp.int32) >> 1), 16, 16))
    timeit("luma gather only 17x17", g, lp, mvx, mvy)

    g8 = jax.jit(lambda p, x, y: gather_windows(p, cpos_y + (y.astype(jnp.int32) >> 1),
                                                cpos_x + (x.astype(jnp.int32) >> 1), 8, 8))
    timeit("chroma gather only 9x9", g8, cp, mvx, mvy)

    # full 3-component unidir like recon does (6 gathers)
    def all6(lp, cp, mv):
        outs = []
        for comp, (p, py, px, h, w) in enumerate(
                [(lp, pos_y, pos_x, 16, 16), (cp, cpos_y, cpos_x, 8, 8),
                 (cp, cpos_y, cpos_x, 8, 8)]):
            sh = 1 if comp else 0
            for d in range(2):
                outs.append(mc_unidir_tiles(p, py, px, mv[:, 0, d, 0] >> sh,
                                            mv[:, 0, d, 1] >> sh, h, w))
        return outs
    timeit("all 6 gathers (3 comp x fwd/bwd)", jax.jit(all6), lp, cp, mv)


if __name__ == "__main__":
    main()
