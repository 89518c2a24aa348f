#!/usr/bin/env python
"""Per-picture latency breakdown on the real device (VERDICT r4 #6/weak#7):
how much of the gop_chunk=0 frame latency is host stage, device program,
and pure tunnel round trip.  Single TPU client — run alone.

Writes PROFILE_latency_r05.json at the repo root.
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tests"))
sys.path.insert(0, os.path.join(_HERE, "tools"))

import numpy as np

N_PICS = 8


def main():
    import jax
    import jax.numpy as jnp
    from bench_stream import make_bench_stream
    from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder, headers as H

    data = make_bench_stream(N_PICS, os.path.join(_HERE, ".bench_cache"))
    dec = MP2VDecoder(DecoderConfig())
    seq = dec.tokenize_stream(data)
    geom = seq[0][1]

    # pure tunnel round trip: tiny op + block + 1-element host read
    tiny = jax.jit(lambda x: x + 1)
    t = jnp.zeros((8, 128), jnp.int32)
    np.asarray(tiny(t))  # compile
    rtts = []
    for _ in range(12):
        t0 = time.perf_counter()
        np.asarray(tiny(t))[0, 0]
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    recon = dec._gop_recon_for(geom, False, size=1)
    # warm EVERY picture's bucket (both static programs), then join the
    # background exact-bucket compiles — server-side compilation contends
    # with execution on the tunneled platform and would pollute the timing
    for _ in range(2):
        r0 = r1 = None
        for tok, g, ph in seq:
            st = recon.prepare([tok], [ph.picture_coding_type])
            r0, r1, p = recon.dispatch(
                st, r0, r1, bidir=ph.picture_coding_type == H.PCT_B)
        jax.block_until_ready(p)
        recon.quiesce()

    rows = []
    r0 = r1 = None
    for tok, g, ph in seq:
        pct = ph.picture_coding_type
        t0 = time.perf_counter()
        st = recon.prepare([tok], [pct])
        t1 = time.perf_counter()
        r0, r1, packs = recon.dispatch(st, r0, r1, bidir=pct == H.PCT_B)
        t2 = time.perf_counter()
        jax.block_until_ready(packs)
        t3 = time.perf_counter()
        host = np.asarray(packs)
        t4 = time.perf_counter()
        rows.append({"pct": pct,
                     "prepare_ms": round((t1 - t0) * 1e3, 2),
                     "upload_dispatch_ms": round((t2 - t1) * 1e3, 2),
                     "device_wait_ms": round((t3 - t2) * 1e3, 2),
                     "deliver_ms": round((t4 - t3) * 1e3, 2),
                     "total_ms": round((t4 - t0) * 1e3, 2),
                     "total_nodeliver_ms": round((t3 - t0) * 1e3, 2)})
        del host

    med = sorted(r["total_nodeliver_ms"] for r in rows)[len(rows) // 2]
    best = min(r["total_nodeliver_ms"] for r in rows)
    rec = {
        "rtt_ms": round(rtt * 1e3, 2),
        "rtt_reps_ms": [round(x * 1e3, 2) for x in rtts],
        "per_picture": rows,
        "median_latency_ms": med,
        "best_latency_ms": best,
        "median_minus_rtt_ms": round(med - rtt * 1e3, 2),
        "note": "gop_chunk=0 pair-transport path, 1080p; device_wait "
                "includes one block_until_ready tunnel round trip; "
                "deliver is the packed-frame d2h pull",
    }
    print(json.dumps({"median_latency_ms": med, "rtt_ms": rec["rtt_ms"]}))
    with open(os.path.join(_HERE, "PROFILE_latency_r05.json"), "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
