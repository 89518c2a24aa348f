#!/usr/bin/env python
"""Per-stage breakdown of the production decode step on real bench tokens.

Accounts for every millisecond of the GOP-chunk program (VERDICT r2 weak #2):
chained on-device timings (tools/tbench.py — the only trustworthy method on
the tunneled platform) of the full chunk step and each constituent stage,
plus wall-clock host costs (tokenize, h2d upload, d2h packed download).
Writes PROFILE_r03.json at the repo root.
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tools"))
sys.path.insert(0, os.path.join(_HERE, "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from bench_stream import make_bench_stream
from tbench import chain_time
from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder
from tiny_mp2v_dec_tpu.headers import CHROMA_420
from tiny_mp2v_dec_tpu.ops.idct import idct_blocks_pallas, idct_blocks_jnp
from tiny_mp2v_dec_tpu.ops.mc_pallas import (fused_mc_recon, mc_meta,
                                             pad_ref_plane)
from tiny_mp2v_dec_tpu.ops.recon import (DeviceRecon, GopRecon, pack_meta,
                                         _bucket, _sparse_src_map, META_COLS,
                                         _plane_from_tiles, _tiles_from_blocks)
from tiny_mp2v_dec_tpu.tokenizer.types import PictureGeometry

CHUNK = 16


def tokens_from_bench(data):
    """Tokenize the bench stream through the runtime decoder's own path."""
    toks = []
    dec = MP2VDecoder(DecoderConfig(gop_chunk=0, output_host=False))
    orig = dec._decode_picture

    real_tok = dec.tokenize_picture

    def capture(d, cur):
        pass  # never called; we hook tokenize instead

    def tok_hook(d, slices, params, geom):
        t = real_tok(d, slices, params, geom)
        toks.append((t, params.picture_coding_type, geom))
        return t

    dec.tokenize_picture = tok_hook
    dec.decode(data)
    return toks


def main():
    results = {"backend": jax.default_backend(), "chunk": CHUNK}
    data = make_bench_stream(CHUNK, os.path.join(_HERE, ".bench_cache"))
    toks = tokens_from_bench(data)
    geom = toks[0][2]
    tokens_list = [t for t, _, _ in toks]
    pcts = [p for _, p, _ in toks]
    n_rows = geom.n_mb * geom.blocks_per_mb
    kmax = max(t.n_coded_blocks for t in tokens_list)
    cap = _bucket(kmax + 1, n_rows + 1)
    results["n_mb"] = geom.n_mb
    results["coded_blocks_max"] = kmax
    results["coeff_bucket"] = cap

    # ---- host: tokenize wall clock ----
    dec = MP2VDecoder(DecoderConfig(gop_chunk=0, output_host=False))
    t0 = time.perf_counter()
    for _ in range(3):
        toks2 = tokens_from_bench(data)
    results["tokenize_ms_per_pic"] = (time.perf_counter() - t0) / 3 / len(toks2) * 1e3

    # ---- chunk step, chained on-device (pair-upload interface) ----
    for use_pallas in (True, False):
        g = GopRecon(geom, CHUNK, field_support=False,
                     use_pallas_idct=use_pallas, use_pallas_mc=use_pallas)
        g(tokens_list, pcts)  # fill staging + compile
        (key3, st), = g._stage.items()
        blob = st[0]
        cap_pairs, cap_k3 = key3[0], key3[1]
        is_b = np.asarray([p == 3 for p in pcts])
        refs = g.inner.zero_planes()
        args = (jnp.asarray(blob), jnp.asarray(is_b), jnp.asarray(~is_b),
                *refs, *refs)

        # salt the chain through a reference-plane add (runtime value 0)
        def op2(bl, b, ip, r0y, r0u, r0v, r1y, r1u, r1v, salt):
            return g._gop(bl, b, ip, r0y + salt.astype(jnp.uint8), r0u, r0v,
                          r1y, r1u, r1v, cap_pairs=cap_pairs, cap_k=cap_k3)

        dt = chain_time(op2, args, n=8)
        key = "chunk_step_pallas_ms" if use_pallas else "chunk_step_xla_ms"
        results[key] = dt * 1e3
        results[key.replace("_ms", "_ms_per_pic")] = dt * 1e3 / CHUNK
        print(f"{key}: {dt*1e3:.2f} ms ({dt*1e3/CHUNK:.2f} /pic)")

    # ---- stage timings (pallas config, single picture arrays) ----
    tok = tokens_list[1]  # a P picture
    k = tok.n_coded_blocks
    cap1 = _bucket(k + 1, n_rows + 1)
    sc1 = np.zeros((cap1, 64), np.int16)
    sc1[:k] = tok.cblk[:k]
    ss1 = np.empty(n_rows, np.int32)
    _sparse_src_map(tok.cblk_idx, k, n_rows, dummy=k, out=ss1)
    cblk = jnp.asarray(sc1)
    cidx = jnp.asarray(ss1)

    dt = chain_time(lambda c, s: idct_blocks_pallas((c + s.astype(jnp.int16)).reshape(-1, 64)),
                    (cblk,), n=16)
    results["idct_pallas_ms"] = dt * 1e3
    dt = chain_time(lambda c, s: idct_blocks_jnp(c + s.astype(jnp.int16)), (cblk,), n=16)
    results["idct_jnp_ms"] = dt * 1e3

    # residual assembly: sparse gather + tiles + plane (luma only)
    recon = DeviceRecon(geom, field_support=False, use_pallas_mc=True)

    def resid(c, si, s):
        res = recon._residual_sparse(c, si + s)
        tiles = _tiles_from_blocks(res[:, :4], 2, 2, None)
        return _plane_from_tiles(tiles, geom.mb_height, geom.mb_width, 16, 16)

    dt = chain_time(resid, (cblk, cidx), n=16)
    results["residual_luma_plane_ms"] = dt * 1e3

    # fused MC kernel alone (luma, bidir)
    H_, W_ = geom.luma_padded
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.integers(0, 256, (H_, W_)).astype(np.uint8))
    p0 = jax.jit(lambda p: pad_ref_plane(p, 16, 16))(plane)
    res_plane = jnp.zeros((H_, W_), jnp.int16)
    mv = jnp.asarray(tok.mv)
    pos_y, pos_x = recon._pos[0]
    syf, sxf, phf = mc_meta(pos_y, pos_x, mv[:, 0, 0, 0], mv[:, 0, 0, 1],
                            H_, W_, 16, 16)
    mode = jnp.full((geom.n_mb,), 7, jnp.int32)

    def mc_op(p, r, sy, sx, ph, m, s):
        return fused_mc_recon(p, p, r, sy, sx + s, ph, sy, sx, ph, m,
                              h=16, w=16, H=H_, W=W_)

    dt = chain_time(mc_op, (p0, res_plane, syf, sxf, phf, mode), n=16)
    results["fused_mc_luma_bidir_ms"] = dt * 1e3

    # ref pad embed cost
    dt = chain_time(lambda p, s: pad_ref_plane(p + s.astype(jnp.uint8), 16, 16),
                    (plane,), n=16)
    results["pad_ref_plane_ms"] = dt * 1e3

    # ---- transfers (wall clock): the consolidated chunk upload blob ----
    g = GopRecon(geom, CHUNK, field_support=False)
    g(tokens_list, pcts)
    blob = next(iter(g._stage.values()))[0]
    t0 = time.perf_counter()
    for _ in range(3):
        x = jnp.asarray(blob)
        jax.block_until_ready(x)
    up_s = (time.perf_counter() - t0) / 3
    results["h2d_chunk_blob_ms"] = up_s * 1e3
    results["h2d_chunk_blob_mb"] = blob.nbytes / 1e6

    xs, ys = 1, 1
    cw_ = (geom.width + 1) >> xs
    ch_ = (geom.height + 1) >> ys
    frame_bytes = geom.height * geom.width + 2 * cw_ * ch_
    packs = jnp.zeros((CHUNK, frame_bytes), jnp.uint8)
    jax.block_until_ready(packs)
    t0 = time.perf_counter()
    h = np.asarray(packs)
    results["d2h_chunk_packed_ms"] = (time.perf_counter() - t0) * 1e3
    results["d2h_chunk_packed_mb"] = packs.nbytes / 1e6

    with open(os.path.join(_HERE, "PROFILE_r03.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
