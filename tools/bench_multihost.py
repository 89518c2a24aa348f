#!/usr/bin/env python
"""Multi-host scaling efficiency (simulated): decode an N-GOP stream with 1
and 2 worker processes (CPU backend each — the simulation of per-host JAX
runtimes) and report efficiency = T1 / (2 * T2).  Bar: >=80%
(BASELINE.json:5).  Pools are pre-warmed so the measurement isolates
scheduling + decode, not process startup/compiles — the reference's
threads_test discipline (test/gtest/threads/threads_test.cpp).

Writes MULTIHOST_SCALING.json at the repo root.
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

N_GOPS = 8
PICS_PER_GOP = 4
REPS = 3


def make_stream():
    import numpy as np
    from m2v_encoder import encode_stream, random_picture
    from tiny_mp2v_dec_tpu import headers as H

    parts = []
    seq_end = bytes([0, 0, 1, H.SEQUENCE_END_CODE])
    for g in range(N_GOPS):
        rng = np.random.default_rng(400 + g)
        pcts = [H.PCT_I, H.PCT_P, H.PCT_B, H.PCT_B][:PICS_PER_GOP]
        pics = []
        for i, pct in enumerate(pcts):
            p = random_picture(rng, 8, 6, H.CHROMA_420, pct)
            p.temporal_reference = i
            pics.append(p)
        s = encode_stream(128, 96, H.CHROMA_420, pics)
        parts.append(s[:-len(seq_end)] if g < N_GOPS - 1 else s)
    return b"".join(parts)


def measure(n_hosts, data):
    from tiny_mp2v_dec_tpu.parallel.hosts import MultiHostDecoder
    # one core per simulated host: "a host's resources" must not overlap,
    # or 1-host timing silently uses the whole machine via XLA's intra-op
    # thread pool and the scaling ratio is meaningless
    with MultiHostDecoder(n_hosts, platform="cpu", cores_per_host=1) as mh:
        mh.warmup(data)
        mh.decode(data)  # second warmup pass: every chunk shape compiled
        best = float("inf")
        n = 0
        for _ in range(REPS):
            t0 = time.perf_counter()
            frames = mh.decode(data)
            best = min(best, time.perf_counter() - t0)
            n = len(frames)
    return best, n


def main():
    data = make_stream()
    t1, n1 = measure(1, data)
    t2, n2 = measure(2, data)
    assert n1 == n2 == N_GOPS * PICS_PER_GOP
    eff = t1 / (2 * t2)
    rec = {
        "gops": N_GOPS, "frames": n1,
        "t1_s": round(t1, 4), "t2_s": round(t2, 4),
        "speedup_2host": round(t1 / t2, 3),
        "efficiency_2host": round(eff, 3),
        "bar": 0.8, "pass": eff >= 0.8,
        "note": "simulated hosts = worker processes, CPU backend, "
                "pre-warmed pools, best of %d" % REPS,
    }
    print(json.dumps(rec, indent=2))
    with open(os.path.join(_HERE, "MULTIHOST_SCALING.json"), "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
