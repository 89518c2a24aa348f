#!/usr/bin/env python
"""Instrument the EXACT production bench loop stage by stage on the real
device: tokenize, staging fill, flat h2d uploads, chunk dispatch, and the
block_until_ready on chunk outputs.  This is the wall-clock account of
bench.py's run() (VERDICT r2 weak #2: name the residual)."""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tools"))
sys.path.insert(0, os.path.join(_HERE, "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from bench_stream import make_bench_stream
from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder
from tiny_mp2v_dec_tpu.ops.recon import (GopRecon, _bucket, _sparse_src_map,
                                         pack_meta)

CHUNK = 16


def main():
    data = make_bench_stream(CHUNK, os.path.join(_HERE, ".bench_cache"))
    out = {"backend": jax.default_backend()}

    # ---- end-to-end, unperturbed (same as bench.py) ----
    dec = MP2VDecoder(DecoderConfig(gop_chunk=16, output_host=False))

    def run():
        dec.reset()
        frames = dec.decode(data)
        jax.block_until_ready([f.device_buffer() for f in frames])
        return frames

    run()  # warmup/compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        frames = run()
        best = min(best, time.perf_counter() - t0)
    out["e2e_chunk_s"] = best
    out["e2e_fps"] = len(frames) / best
    print(f"e2e: {len(frames)} frames in {best:.3f}s = {len(frames)/best:.1f} fps")

    # ---- capture tokens once ----
    toks = []
    real_tok = dec.tokenize_picture

    def tok_hook(d, slices, params, geom):
        t = real_tok(d, slices, params, geom)
        toks.append((t, params.picture_coding_type, geom))
        return t

    dec.reset()
    dec.tokenize_picture = tok_hook
    t0 = time.perf_counter()
    dec.decode(data)
    out["tokenize_plus_all_s"] = time.perf_counter() - t0
    dec.tokenize_picture = real_tok
    geom = toks[0][2]
    tokens_list = [t for t, _, _ in toks]
    pcts = [p for _, p, _ in toks]

    # tokenize alone
    t0 = time.perf_counter()
    dec.reset()
    dec2 = MP2VDecoder(DecoderConfig(gop_chunk=16, output_host=False))
    # time tokenize by rerunning decode on a decoder whose recon is hot
    n_tok = 3
    tk = 0.0
    for _ in range(n_tok):
        dec.reset()
        t0 = time.perf_counter()
        dec.decode(data)
        jax.block_until_ready([f.device_buffer() for f in dec._frames])
    stats = dec.stats
    out["tokenize_s_per_chunk"] = stats["tokenize_s"] / (stats["pictures"] / CHUNK)
    out["device_dispatch_s_per_chunk"] = stats["device_s"] / (stats["pictures"] / CHUNK)

    # ---- manual staged chunk: each stage timed ----
    g = GopRecon(geom, CHUNK, field_support=False)
    n_rows = geom.n_mb * geom.blocks_per_mb
    refs = g.inner.zero_planes()
    is_b_np = np.asarray([p == 3 for p in pcts])

    # warm the compiled fn + staging via one production call
    g(tokens_list, pcts)

    # staging fill (pair packing) alone — the production C scans
    from tiny_mp2v_dec_tpu.ops.recon import _load_packers
    count_pairs, pack_pairs = _load_packers()
    total_k = sum(t.n_coded_blocks for t in tokens_list)
    nnz = np.empty(total_k, np.uint8)
    t0 = time.perf_counter()
    total_nz = 0
    off = 0
    for tok in tokens_list:
        k = tok.n_coded_blocks
        total_nz += count_pairs(np.ascontiguousarray(tok.cblk[:k]),
                                nnz[off:off + k])
        off += k
    pos = np.empty(total_nz, np.uint8)
    val = np.empty(total_nz, np.int16)
    p = 0
    for tok in tokens_list:
        k = tok.n_coded_blocks
        p += pack_pairs(np.ascontiguousarray(tok.cblk[:k]), pos[p:], val[p:])
    out["stage_pack_s"] = time.perf_counter() - t0
    out["total_k"] = total_k
    out["total_nz"] = total_nz
    (key, (blob, pp, pv, pn, sp, sm)), = g._stage.items()
    cap_pairs, cap_k = key[0], key[1]
    out["upload_mb"] = blob.nbytes / 1e6

    # single consolidated upload, blocked
    tmin = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = jnp.asarray(blob)
        jax.block_until_ready(x)
        tmin = min(tmin, time.perf_counter() - t0)
    out["h2d_blob_s"] = tmin

    # device step with inputs already resident
    args = (jnp.asarray(blob), jnp.asarray(is_b_np), jnp.asarray(~is_b_np),
            *refs, *refs)
    kw = dict(cap_pairs=cap_pairs, cap_k=cap_k)
    jax.block_until_ready(g._fn(*args, **kw))
    tmin = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = g._fn(*args, **kw)
        jax.block_until_ready(o)
        tmin = min(tmin, time.perf_counter() - t0)
    out["device_step_resident_s"] = tmin

    # dispatch-only cost (how long does the host stay busy per call)
    t0 = time.perf_counter()
    o = g._fn(*args, **kw)
    out["dispatch_only_s"] = time.perf_counter() - t0
    jax.block_until_ready(o)

    # full production call (fill + upload + step)
    tmin = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = g(tokens_list, pcts)
        jax.block_until_ready(o)
        tmin = min(tmin, time.perf_counter() - t0)
    out["fill_upload_step_s"] = tmin

    for k, v in out.items():
        print(f"{k}: {v}")
    with open(os.path.join(_HERE, "PROFILE_bench_loop.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
