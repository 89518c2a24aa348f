#!/usr/bin/env python
"""Round-5 kernel cost profile: production (MXU) luma pass vs the fused
U+V chroma pass at 1080p (VERDICT r4 #10 asks UV <= 0.6x luma).  Single
TPU client — run alone.  Writes PROFILE_mc_r05.json.
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
    if jax.default_backend() != "tpu":
        print("no TPU — skipped")
        return 2
    from tbench import chain_time
    from tiny_mp2v_dec_tpu.headers import CHROMA_420
    from tiny_mp2v_dec_tpu.ops.mc_pallas import (
        fused_mc_recon_mxu, fused_mc_recon_uv_mxu, interleave_uv, mc_meta,
        pad_ref_plane, pad_ref_plane_uv)
    from tiny_mp2v_dec_tpu.ops.recon import DeviceRecon
    from tiny_mp2v_dec_tpu.tokenizer.types import PictureGeometry

    geom = PictureGeometry(1920, 1088, CHROMA_420)
    n = geom.n_mb
    rng = np.random.default_rng(0)
    recon = DeviceRecon(geom, field_support=False, use_pallas_mc=True)
    mode = jnp.full((n,), 7, jnp.int32)
    out = {}

    # luma
    H_, W_ = geom.luma_padded
    plane = jnp.asarray(rng.integers(0, 256, (H_, W_)).astype(np.uint8))
    res = jnp.asarray(rng.integers(-64, 64, (H_, W_)).astype(np.int16))
    mv = jnp.asarray(rng.integers(-63, 64, (n, 2)).astype(np.int16))
    pos_y, pos_x = recon._pos[0]
    p0 = jax.jit(lambda p: pad_ref_plane(p, 16, 16).astype(jnp.bfloat16))(plane)
    sy, sx, ph = mc_meta(pos_y, pos_x, mv[:, 0], mv[:, 1], H_, W_, 16, 16)

    def luma_op(pp, r, sy, sx, ph, m, salt):
        return fused_mc_recon_mxu(pp, pp, r, sy, sx + salt, ph, sy, sx, ph,
                                  m, h=16, w=16, H=H_, W=W_)
    t_luma = chain_time(luma_op, (p0, res, sy, sx, ph, mode), n=16)
    out["mxu_luma_bidir_ms"] = round(t_luma * 1e3, 3)
    print(f"mxu_luma_bidir      {t_luma*1e3:8.3f} ms", flush=True)

    # fused U+V
    Hc, Wc = geom.chroma_padded
    u = jnp.asarray(rng.integers(0, 256, (Hc, Wc)).astype(np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (Hc, Wc)).astype(np.uint8))
    res_uv = jax.jit(interleave_uv)(
        jnp.asarray(rng.integers(-64, 64, (Hc, Wc)).astype(np.int16)),
        jnp.asarray(rng.integers(-64, 64, (Hc, Wc)).astype(np.int16)))
    cpos_y, cpos_x = recon._pos[1]
    uvp = jax.jit(lambda a, b: pad_ref_plane_uv(a, b, 8, 8).astype(
        jnp.bfloat16))(u, v)
    mvc = (mv // 2).astype(jnp.int16)
    csy, csx, cph = mc_meta(cpos_y, cpos_x, mvc[:, 0], mvc[:, 1],
                            Hc, Wc, 8, 8)

    for pair in (False, True):
        def uv_op(pp, r, sy, sx, ph, m, salt, _p=pair):
            return fused_mc_recon_uv_mxu(pp, pp, r, sy, 2 * sx + salt, ph,
                                         sy, 2 * sx, ph, m, h=8, w=8,
                                         H=Hc, W=Wc, pair=_p)
        t_uv = chain_time(uv_op, (uvp, res_uv, csy, csx, cph, mode), n=32)
        key = "mxu_uv_fused_bidir_pair_ms" if pair else \
            "mxu_uv_fused_bidir_ms"
        out[key] = round(t_uv * 1e3, 3)
        print(f"{key:28s} {t_uv*1e3:8.3f} ms", flush=True)
    # production UV = paired-direction selection (bidir chunks)
    t_uv = out["mxu_uv_fused_bidir_pair_ms"] / 1e3
    out["uv_over_luma"] = round(t_uv / t_luma, 3)
    out["bar_uv_over_luma"] = 0.6
    out["pass"] = bool(t_uv / t_luma <= 0.6)
    print(f"uv/luma (pair, production) {t_uv/t_luma:.2f}", flush=True)

    with open(os.path.join(_HERE, "PROFILE_mc_r05.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
