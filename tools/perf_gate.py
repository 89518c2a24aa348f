#!/usr/bin/env python
"""Kernel performance gate (reference analog: simd_test's requirement that
SIMD MC beat scalar C by >25%, test/gtest/simd/mc_test.cpp:86-87,109).

On a TPU backend, chain-times the production Pallas kernels against the
jnp/XLA formulations on flagship-geometry data and FAILS (exit 1) unless:
  * fused Pallas MC+recon is >=1.25x the XLA gather formulation
  * the GOP chunk step with Pallas kernels is >= the XLA-only step
Exits 2 (skip) off-TPU.  Run by ci.sh when a TPU is present; also invoked
by tests/test_perf_gate.py when MP2V_TPU_PERF_GATE=1.
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
        print("perf_gate: no TPU backend — skipped")
        return 2
    from tbench import chain_time
    from tiny_mp2v_dec_tpu.headers import CHROMA_420
    from tiny_mp2v_dec_tpu.ops.mc import mc_bidir_tiles, mc_unidir_tiles, pad_for_mc
    from tiny_mp2v_dec_tpu.ops.mc_pallas import (fused_mc_recon_mxu,
                                                 mc_meta, pad_ref_plane)
    from tiny_mp2v_dec_tpu.ops.recon import DeviceRecon
    from tiny_mp2v_dec_tpu.tokenizer.types import PictureGeometry

    geom = PictureGeometry(width=1920, height=1088, chroma_format=CHROMA_420)
    n = geom.n_mb
    H_, W_ = geom.luma_padded
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.integers(0, 256, (H_, W_)).astype(np.uint8))
    res_plane = jnp.asarray(rng.integers(-64, 64, (H_, W_)).astype(np.int16))
    mv = jnp.asarray(rng.integers(-63, 64, (n, 2)).astype(np.int16))
    recon = DeviceRecon(geom, field_support=False, use_pallas_mc=True)
    pos_y, pos_x = recon._pos[0]
    mode = jnp.full((n,), 7, jnp.int32)

    # Pallas fused MC+recon (production TPU path: MXU window selection)
    p0 = jax.jit(lambda p: pad_ref_plane(p, 16, 16).astype(
        jnp.bfloat16))(plane)
    syf, sxf, phf = mc_meta(pos_y, pos_x, mv[:, 0], mv[:, 1], H_, W_, 16, 16)

    def pallas_op(pp, r, sy, sx, ph, m, salt):
        return fused_mc_recon_mxu(pp, pp, r, sy, sx + salt, ph, sy, sx,
                                  ph, m, h=16, w=16, H=H_, W=W_)

    t_pallas = chain_time(pallas_op, (p0, res_plane, syf, sxf, phf, mode), n=16)

    # XLA gather formulation (bidir luma + residual add, like the kernel)
    padded = jax.jit(pad_for_mc)(plane)

    @jax.jit
    def xla_op(pad, r, mvx, mvy, salt):
        pf = mc_unidir_tiles(pad, pos_y, pos_x, mvx + salt.astype(jnp.int16),
                             mvy, 16, 16)
        pb = mc_unidir_tiles(pad, pos_y, pos_x, mvx, mvy, 16, 16)
        both = mc_bidir_tiles(pf, pb)
        tiles = r.reshape(geom.mb_height, 16, geom.mb_width, 16).transpose(
            0, 2, 1, 3).reshape(n, 16, 16)
        val = jnp.clip(both.astype(jnp.int16) + tiles, 0, 255).astype(jnp.uint8)
        return val

    t_xla = chain_time(xla_op, (padded, res_plane, mv[:, 0], mv[:, 1]), n=16)

    # Gate 2: the whole GOP chunk step (scatter+IDCT+scan) with Pallas
    # kernels must beat the XLA-only formulation of the same program.
    # Chained through the uploaded blob (salt) — one compile per variant.
    # Content: the bench stream's real tokens — dense random tokens give
    # a ~24M-pair program whose compile OOM-kills the tunneled platform's
    # compile helper, and production density is what the gate should
    # measure anyway.
    from bench_stream import make_bench_stream
    from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder
    from tiny_mp2v_dec_tpu.ops.recon import GopRecon
    chunk = 16
    data = make_bench_stream(chunk, os.path.join(_HERE, ".bench_cache"))
    dec = MP2VDecoder(DecoderConfig())
    seq = dec.tokenize_stream(data)
    toks = [t for t, _, _ in seq]
    pcts = [ph.picture_coding_type for _, _, ph in seq]
    chunk_ms = {}
    for name, use in (("pallas", True), ("xla", False)):
        gr = GopRecon(geom, chunk, field_support=False,
                      use_pallas_idct=use, use_pallas_mc=use)
        # drive one real call to build staging + pick caps
        gr(toks, pcts)
        (key, stage), = [kv for kv in gr._stage.items()
                         if kv[0][2] == 0] or [next(iter(gr._stage.items()))]
        cap_pairs, cap_k = key[0], key[1]
        from tiny_mp2v_dec_tpu.ops.recon import _split_point
        whole = stage[0]
        half = _split_point(len(whole))
        blob_a = jnp.asarray(whole[:half])
        blob_b = jnp.asarray(whole[half:])
        zeros = gr.inner.zero_planes()

        def chunk_op(ba, bb_, r0y, r0u, r0v, salt, _gr=gr, _cp=cap_pairs,
                     _ck=cap_k):
            return _gr._fn(ba + salt.astype(jnp.uint8), bb_,
                           r0y, r0u, r0v, r0y, r0u, r0v,
                           cap_pairs=_cp, cap_k=_ck)
        chunk_ms[name] = chain_time(chunk_op, (blob_a, blob_b, *zeros), n=8)

    # Gate 3: the SERVING path (StreamBatchRecon, 2 streams on this chip)
    # with the production kernels must beat its XLA formulation >=2x
    # (VERDICT r4 #2: the serving mode used to run XLA MC, leaving ~4x
    # per chip on the table; reference always serves on SIMD,
    # src/core/mc.cpp:4-25).
    from tiny_mp2v_dec_tpu.parallel.mesh import StreamBatchRecon, make_mesh
    S = 2
    smesh = make_mesh(1, axes=("stream",))
    serve_ms = {}
    for name, use in (("pallas", True), ("xla", False)):
        sb = StreamBatchRecon(geom, smesh, n_streams=S,
                              use_pallas_idct=use, use_pallas_mc=use)
        planes = sb(toks[:S])       # warm compile + fill a staging slot
        jax.block_until_ready(planes)
        key = max(sb.transport._stage,
                  key=lambda k: len(sb.transport._stage[k][0]))
        cap_pairs, cap_k = key[0], key[1]
        blob = jnp.asarray(sb.transport._stage[key][0])
        refs = sb._zero_refs()
        fn = sb._fn_for(cap_pairs, cap_k)

        def serve_op(b, r0y, r0u, r0v, r1y, r1u, r1v, salt, _fn=fn):
            # chain on the RECONSTRUCTED planes (out[6:9]) — the first
            # outputs are ref-list selects of the INPUT refs, and chaining
            # on those lets XLA dead-code-eliminate the whole recon (r5:
            # serve_xla_ms measured 0.046 that way)
            return _fn(b + salt.astype(jnp.uint8),
                       r0y, r0u, r0v, r1y, r1u, r1v)[6:9]
        # n=32: the 2-stream step is only a few ms, so the chained signal
        # must clear the tunnel-RTT noise floor (n=8 measured 0 once)
        serve_ms[name] = chain_time(serve_op, (blob, *refs, *refs), n=32)

    speedup = t_xla / t_pallas
    chunk_speedup = chunk_ms["xla"] / chunk_ms["pallas"]
    serve_speedup = (serve_ms["xla"] / serve_ms["pallas"]
                     if serve_ms["pallas"] > 0 else 0.0)
    rec = {"mc_pallas_ms": round(t_pallas * 1e3, 3),
           "mc_xla_ms": round(t_xla * 1e3, 3),
           "speedup": round(speedup, 2), "gate": 1.25,
           "chunk_pallas_ms": round(chunk_ms["pallas"] * 1e3, 3),
           "chunk_xla_ms": round(chunk_ms["xla"] * 1e3, 3),
           "chunk_speedup": round(chunk_speedup, 2), "chunk_gate": 1.0,
           "serve_pallas_ms": round(serve_ms["pallas"] * 1e3, 3),
           "serve_xla_ms": round(serve_ms["xla"] * 1e3, 3),
           "serve_speedup": round(serve_speedup, 2), "serve_gate": 2.0,
           "pass": bool(speedup >= 1.25 and chunk_speedup >= 1.0
                        and serve_speedup >= 2.0)}
    print(json.dumps(rec))
    with open(os.path.join(_HERE, "PERF_GATE.json"), "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    return 0 if rec["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
