#!/usr/bin/env python
"""Measure the reference C++ decoder (SSE2 build, all host cores) on the
exact stream bench.py times, and record the result in BASELINE_MEASURED.json
at the repo root so bench.py's vs_baseline is a real ratio.

Timing follows the reference's own guidance: file output off
(reference: README.md:48), wall clock around decode+flush
(tiny_mp2v_dec.cpp:50-55), best of N runs.
"""
from __future__ import annotations

import json
import os
import platform
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "refbuild"))

from bench_stream import make_bench_stream  # noqa: E402

N_PICTURES = 64
REPS = 5


def main() -> int:
    import build as refbuild
    binary = refbuild.build_reference_decoder()
    data = make_bench_stream(N_PICTURES, os.path.join(_REPO, ".bench_cache"))
    stream_path = os.path.join(_REPO, ".bench_cache", "baseline_stream.m2v")
    with open(stream_path, "wb") as f:
        f.write(data)
    threads = os.cpu_count() or 2
    stats = refbuild.run_reference(binary, stream_path, "-", 1920, 1088, 1,
                                   threads=threads, reps=REPS, timeout=1800)
    record = {
        "metric": "1080p_420_decode_throughput",
        "fps": stats["fps"],
        "frames": int(stats["frames"]),
        "time_ms_best": stats["time_ms"],
        "reps": REPS,
        "threads": threads,
        "host": platform.platform(),
        "cpu_count": os.cpu_count(),
        "decoder": "fxslava/tiny_mp2v_dec SSE2 -Ofast (tools/refbuild)",
        "stream": f"{N_PICTURES}x 1080p 4:2:0 IBBP (tools/bench_stream.py)",
    }
    out = os.path.join(_REPO, "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
