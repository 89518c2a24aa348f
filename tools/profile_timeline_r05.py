#!/usr/bin/env python
"""Per-chunk pipeline timeline of the bench decode loop (single TPU
client — run alone).  Answers: where does wall time go between the
chain-timed device step (~22 ms/chunk) and the recorded bench wall
(~110 ms/chunk)?  Wraps GopRecon.prepare/dispatch and the split upload
with timestamps and probes chunk completion from a side thread.

Writes PROFILE_timeline_r05.json.
"""
import json
import os
import sys
import threading
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tests"))
sys.path.insert(0, os.path.join(_HERE, "tools"))

import numpy as np

N_PICTURES = 64
REPS = 6


def main():
    import jax
    from bench_stream import make_bench_stream
    from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder
    from tiny_mp2v_dec_tpu.ops import recon as R

    data = make_bench_stream(N_PICTURES, os.path.join(_HERE, ".bench_cache"))
    dec = MP2VDecoder(DecoderConfig(gop_chunk=16, output_host=False,
                                pictures_pool_size=0))

    import bench
    bench.precompile_chunk_variants(dec, data)
    for r in R._GOP_RECONS.values():
        r.quiesce()

    def run():
        dec.reset()
        frames = dec.decode(data)
        jax.block_until_ready([f.device_buffer() for f in frames])
        return frames

    run(); run()   # warm

    events = []
    t_origin = [0.0]

    def now():
        return time.perf_counter() - t_origin[0]

    orig_prepare = R.GopRecon.prepare
    orig_dispatch = R.GopRecon.dispatch
    orig_upload = R._upload_split

    def prepare(self, tokens_list, pct_list):
        t0 = now()
        out = orig_prepare(self, tokens_list, pct_list)
        events.append(("prepare", t0, now()))
        return out

    def upload_split(blob):
        t0 = now()
        out = orig_upload(blob)
        events.append(("upload", t0, now(), len(blob)))
        return out

    def dispatch(self, staged, ref0=None, ref1=None, bidir=True):
        t0 = now()
        out = orig_dispatch(self, staged, ref0, ref1, bidir)
        t1 = now()
        events.append(("dispatch", t0, t1))
        packs = out[2]
        idx = len([e for e in events if e[0] == "dispatch"]) - 1

        def probe():
            jax.block_until_ready(packs)
            events.append(("complete", idx, now()))
        threading.Thread(target=probe, daemon=True).start()
        return out

    R.GopRecon.prepare = prepare
    R.GopRecon.dispatch = dispatch
    R._upload_split = upload_split
    try:
        best = None
        for _ in range(REPS):
            events.clear()
            t_origin[0] = time.perf_counter()
            frames = run()
            wall = now()
            time.sleep(0.2)   # let completion probes land
            if best is None or wall < best[0]:
                best = (wall, list(events))
    finally:
        R.GopRecon.prepare = orig_prepare
        R.GopRecon.dispatch = orig_dispatch
        R._upload_split = orig_upload

    wall, ev = best
    rec = {"wall_s": round(wall, 4), "n_frames": len(frames),
           "fps": round(len(frames) / wall, 1),
           "prepare": [], "upload": [], "dispatch": [], "complete": {}}
    for e in ev:
        if e[0] == "prepare":
            rec["prepare"].append([round(e[1], 4), round(e[2], 4)])
        elif e[0] == "upload":
            rec["upload"].append([round(e[1], 4), round(e[2], 4), e[3]])
        elif e[0] == "dispatch":
            rec["dispatch"].append([round(e[1], 4), round(e[2], 4)])
        elif e[0] == "complete":
            rec["complete"][str(e[1])] = round(e[2], 4)
    # derived: per-chunk exec window = completion[i] - max(dispatch_end[i],
    # completion[i-1])
    execs = []
    comp_prev = 0.0
    for i, (d0, d1) in enumerate(rec["dispatch"]):
        c = rec["complete"].get(str(i))
        if c is None:
            continue
        execs.append(round(c - max(d1, comp_prev), 4))
        comp_prev = c
    rec["exec_window_s"] = execs
    print(json.dumps({"wall_s": rec["wall_s"], "fps": rec["fps"],
                      "exec_windows": execs}))
    with open(os.path.join(_HERE, "PROFILE_timeline_r05.json"), "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
