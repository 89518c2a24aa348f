#!/usr/bin/env python
"""Round-4 MC kernel shootout on real TPU: roll vs SWAR implementations.

Chain-timed (tools/tbench.py).  Also checks on-chip bit-exactness of the
SWAR path against the roll path, and times the full GOP chunk step under
both implementations.  Writes PROFILE_mc_r04.json.
"""
import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tools"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tbench import chain_time
    from tiny_mp2v_dec_tpu.headers import CHROMA_420
    from tiny_mp2v_dec_tpu.ops.mc_pallas import (
        fused_mc_pred_swar, fused_mc_recon, mc_meta, pad_ref_plane,
        pad_ref_words, unpack_words)
    from tiny_mp2v_dec_tpu.tokenizer.types import PictureGeometry

    print("backend:", jax.default_backend(), flush=True)
    out = {"backend": jax.default_backend()}

    geom = PictureGeometry(width=1920, height=1088, chroma_format=CHROMA_420)
    n = geom.n_mb
    H_, W_ = geom.mb_height * 16, geom.mb_width * 16
    rng = np.random.default_rng(0)
    plane0 = jnp.asarray(rng.integers(0, 256, (H_, W_)).astype(np.uint8))
    plane1 = jnp.asarray(rng.integers(0, 256, (H_, W_)).astype(np.uint8))
    res = jnp.asarray(rng.integers(-300, 300, (H_, W_)).astype(np.int16))
    mb_y, mb_x = np.divmod(np.arange(n), geom.mb_width)
    pos_y = jnp.asarray(mb_y * 16, jnp.int32)
    pos_x = jnp.asarray(mb_x * 16, jnp.int32)
    mvf = jnp.asarray(rng.integers(-60, 61, (n, 2)).astype(np.int16))
    mvb = jnp.asarray(rng.integers(-60, 61, (n, 2)).astype(np.int16))
    mode = jnp.asarray(rng.integers(0, 4, (n,)).astype(np.int32))
    mode_r = mode | 4  # roll kernel wants the coded bit; all coded
    syf, sxf, phf = mc_meta(pos_y, pos_x, mvf[:, 0], mvf[:, 1], H_, W_, 16, 16)
    syb, sxb, phb = mc_meta(pos_y, pos_x, mvb[:, 0], mvb[:, 1], H_, W_, 16, 16)

    p0 = jax.jit(lambda p: pad_ref_plane(p, 16, 16))(plane0)
    p1 = jax.jit(lambda p: pad_ref_plane(p, 16, 16))(plane1)
    w0 = jax.jit(lambda p: pad_ref_words(p, 16, 16))(plane0)
    w1 = jax.jit(lambda p: pad_ref_words(p, 16, 16))(plane1)
    jax.block_until_ready((p0, p1, w0, w1))

    def roll_op(a, b, r, sy, sx, ph, m, salt, bidir):
        return fused_mc_recon(a, b, r, sy, sx + salt, ph, syb, sxb, phb, m,
                              h=16, w=16, H=H_, W=W_, bidir=bidir)

    def swar_op(a, b, sy, sx, ph, m, salt, bidir):
        return fused_mc_pred_swar(a, b, sy, sx + salt, ph, syb, sxb, phb, m,
                                  h=16, w=16, H=H_, W=W_, bidir=bidir)

    import functools
    for name, op, args in [
        ("roll_luma_bidir", functools.partial(roll_op, bidir=True),
         (p0, p1, res, syf, sxf, phf, mode_r)),
        ("roll_luma_fwd", functools.partial(roll_op, bidir=False),
         (p0, p1, res, syf, sxf, phf, mode_r)),
        ("swar_luma_bidir", functools.partial(swar_op, bidir=True),
         (w0, w1, syf, sxf, phf, mode)),
        ("swar_luma_fwd", functools.partial(swar_op, bidir=False),
         (w0, w1, syf, sxf, phf, mode)),
    ]:
        t = chain_time(op, args, n=16)
        out[name + "_ms"] = round(t * 1e3, 4)
        print(f"{name:24s} {t*1e3:8.3f} ms", flush=True)

    # swar epilogue (unpack + residual + clip) as XLA would run it fused
    @jax.jit
    def swar_full(a, b, r, sy, sx, ph, m, salt):
        pw = fused_mc_pred_swar(a, b, sy, sx + salt, ph, syb, sxb, phb, m,
                                h=16, w=16, H=H_, W=W_, bidir=True)
        return jnp.clip(unpack_words(pw).astype(jnp.int16) + r,
                        0, 255).astype(jnp.uint8)
    t = chain_time(swar_full, (w0, w1, res, syf, sxf, phf, mode), n=16)
    out["swar_luma_bidir_full_ms"] = round(t * 1e3, 4)
    print(f"{'swar_luma_bidir_full':24s} {t*1e3:8.3f} ms", flush=True)

    # on-chip bit-exactness: swar+epilogue == roll kernel
    ref_o = roll_op(p0, p1, res, syf, sxf, phf, mode_r, 0, bidir=True)
    got_o = swar_full(w0, w1, res, syf, sxf, phf, mode, 0)
    same = bool(jnp.array_equal(ref_o, got_o))
    out["onchip_parity"] = same
    print("on-chip parity:", same, flush=True)

    # chroma 4:2:0 (both impls)
    ch, cw = H_ // 2, W_ // 2
    c0 = jnp.asarray(rng.integers(0, 256, (ch, cw)).astype(np.uint8))
    cres = jnp.asarray(rng.integers(-300, 300, (ch, cw)).astype(np.int16))
    cpy = jnp.asarray((mb_y * 16) >> 1, jnp.int32)
    cpx = jnp.asarray((mb_x * 16) >> 1, jnp.int32)
    csy, csx, cph = mc_meta(cpy, cpx, mvf[:, 0] >> 1, mvf[:, 1] >> 1,
                            ch, cw, 8, 8)
    pc = jax.jit(lambda p: pad_ref_plane(p, 8, 8))(c0)
    wc = jax.jit(lambda p: pad_ref_words(p, 8, 8))(c0)
    jax.block_until_ready((pc, wc))

    def roll_c(a, r, sy, sx, ph, m, salt):
        return fused_mc_recon(a, a, r, sy, sx + salt, ph, sy, sx, ph, m,
                              h=8, w=8, H=ch, W=cw, bidir=True)

    def swar_c(a, sy, sx, ph, m, salt):
        return fused_mc_pred_swar(a, a, sy, sx + salt, ph, sy, sx, ph, m,
                                  h=8, w=8, H=ch, W=cw, bidir=True)

    t = chain_time(roll_c, (pc, cres, csy, csx, cph, mode_r), n=16)
    out["roll_chroma_bidir_ms"] = round(t * 1e3, 4)
    print(f"{'roll_chroma_bidir':24s} {t*1e3:8.3f} ms", flush=True)
    t = chain_time(swar_c, (wc, csy, csx, cph, mode), n=16)
    out["swar_chroma_bidir_ms"] = round(t * 1e3, 4)
    print(f"{'swar_chroma_bidir':24s} {t*1e3:8.3f} ms", flush=True)

    # full chunk step, both implementations
    from tiny_mp2v_dec_tpu.ops.recon import GopRecon
    from tiny_mp2v_dec_tpu.parallel.mesh import random_tokens
    nprng = np.random.default_rng(1)
    chunk = 16
    toks = [random_tokens(nprng, geom) for _ in range(chunk)]
    pcts = [1] + [2, 3, 3] * 5
    for impl in ("swar", "roll"):
        gr = GopRecon(geom, chunk, field_support=False, use_pallas_idct=True,
                      use_pallas_mc=True, mc_impl=impl)
        gr(toks, pcts)
        key = next(iter(gr._stage))
        cap_pairs, cap_k = key[0], key[1]
        from tiny_mp2v_dec_tpu.ops.recon import _split_point
        whole = gr._stage[key][0]
        half = _split_point(len(whole))
        blob_a = jnp.asarray(whole[:half])
        blob_b = jnp.asarray(whole[half:])
        zeros = gr.inner.zero_planes()

        def chunk_op(ba, bb_, r0y, r0u, r0v, salt, _gr=gr, _cp=cap_pairs,
                     _ck=cap_k):
            return _gr._fn(ba + salt.astype(jnp.uint8), bb_,
                           r0y, r0u, r0v, r0y, r0u, r0v,
                           cap_pairs=_cp, cap_k=_ck)
        t = chain_time(chunk_op, (blob_a, blob_b, *zeros), n=8)
        out[f"chunk_step_{impl}_ms"] = round(t * 1e3, 3)
        out[f"chunk_step_{impl}_ms_per_pic"] = round(t * 1e3 / chunk, 3)
        print(f"chunk_step_{impl}: {t*1e3:.2f} ms "
              f"({t*1e3/chunk:.2f} ms/pic)", flush=True)

    with open(os.path.join(_HERE, "PROFILE_mc_r04.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
