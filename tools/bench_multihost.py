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
    cores = os.cpu_count() or 1
    hosts = [1, 2, 4, 8]
    times = {}
    frames = None
    for n in hosts:
        t, nf = measure(n, data)
        times[n] = t
        frames = nf
    assert frames == N_GOPS * PICS_PER_GOP
    t1 = times[1]
    points = {}
    ok = True
    for n in hosts:
        # ideal speedup is bounded by the PHYSICAL cores of this machine:
        # beyond `cores` simulated hosts the workers time-share, so the
        # honest ideal is min(n, cores) and the point measures that
        # oversubscription does not DEGRADE throughput (scheduling +
        # serialization overhead stays low).  BASELINE's 1/8/N milestone
        # needs >=8 real hosts to measure true 8-way wall-clock scaling.
        ideal = min(n, cores)
        eff = t1 / (ideal * times[n])
        points[str(n)] = {"t_s": round(times[n], 4),
                          "speedup": round(t1 / times[n], 3),
                          "ideal_speedup": ideal,
                          "efficiency": round(eff, 3)}
        ok = ok and eff >= 0.8
    eff = points["2"]["efficiency"]
    rec = {
        "gops": N_GOPS, "frames": frames,
        "physical_cores": cores,
        "hosts": points,
        "t1_s": round(t1, 4), "t2_s": round(times[2], 4),
        "speedup_2host": round(t1 / times[2], 3),
        "efficiency_2host": eff,
        "bar": 0.8, "pass": ok,
        "note": "simulated hosts = worker processes, CPU backend, "
                "pre-warmed pools, best of %d; efficiency vs "
                "min(n_hosts, physical_cores) ideal" % REPS,
    }
    print(json.dumps(rec, indent=2))
    with open(os.path.join(_HERE, "MULTIHOST_SCALING.json"), "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
