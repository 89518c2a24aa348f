#!/usr/bin/env python
"""Round-5 transport experiments on the tunneled TPU (single client!).

Questions from VERDICT r4 #1a / PERF_NOTES:
  1. Does h2d bandwidth keep scaling with more concurrent upload streams
     (the tunnel is per-message latency-bound; 2 streams measured ~5x the
     serial bandwidth in r4)?  -> pick the split count for _upload_split.
  2. Does an h2d upload overlap device execution, or serialize with it on
     the tunneled timeline (the r4 hypothesis for the ~20 ms/chunk gap)?
  3. Same for d2h delivery.

Writes PROFILE_transport_r05.json at the repo root.
"""
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import numpy as np

MB = 1 << 20
PAYLOAD = 4 * MB          # ~ the bench chunk blob
REPS = 6


def best(f, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    import jax
    import jax.numpy as jnp
    backend = jax.default_backend()
    print(f"# backend: {backend}", file=sys.stderr)
    rec = {"backend": backend, "payload_mb": PAYLOAD / MB}

    blob = np.random.default_rng(0).integers(
        0, 256, PAYLOAD, dtype=np.uint8)

    # --- 1. h2d bandwidth vs concurrent split count -------------------
    pools = {k: ThreadPoolExecutor(max_workers=k) for k in (1, 2, 4, 8)}
    h2d = {}
    for k in (1, 2, 4, 8):
        bound = [blob[i * (PAYLOAD // k):(i + 1) * (PAYLOAD // k)]
                 for i in range(k)]

        def up(bound=bound, pool=pools[k]):
            futs = [pool.submit(jnp.asarray, b) for b in bound]
            out = [f.result() for f in futs]
            jax.block_until_ready(out)
            return out
        up()  # warm
        t, ts = best(up)
        h2d[str(k)] = {"s": round(t, 4),
                       "mb_s": round(PAYLOAD / MB / t, 1),
                       "reps_s": [round(x, 4) for x in ts]}
        print(f"# h2d split={k}: {PAYLOAD/MB/t:8.1f} MB/s  (best {t*1e3:.1f} ms)",
              file=sys.stderr)
    rec["h2d_split"] = h2d

    # --- 2. h2d vs device execution overlap --------------------------
    # a ~30-60 ms synthetic device workload (chained matmuls)
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2048, 2048)).astype(np.float32))

    @jax.jit
    def work(x, iters):
        def body(_, a):
            return a @ a * 1e-3
        return jax.lax.fori_loop(0, iters, body, x)

    np.asarray(work(x0, 1).ravel()[0])       # compile
    # calibrate iters to ~40 ms
    iters = 4
    while True:
        t0 = time.perf_counter()
        jax.block_until_ready(work(x0, iters))
        dt = time.perf_counter() - t0
        if dt > 0.035 or iters > 4096:
            break
        iters *= 2
    rec["exec_ms"] = round(dt * 1e3, 1)
    print(f"# exec workload: {dt*1e3:.1f} ms ({iters} iters)", file=sys.stderr)

    def upload2():
        futs = [pools[2].submit(jnp.asarray, blob[:PAYLOAD // 2]),
                pools[2].submit(jnp.asarray, blob[PAYLOAD // 2:])]
        out = [f.result() for f in futs]
        jax.block_until_ready(out)

    t_up, _ = best(upload2)
    t_exec, _ = best(lambda: jax.block_until_ready(work(x0, iters)))

    def both():
        y = work(x0, iters)          # async dispatch
        upload2()                    # upload while it runs (?)
        jax.block_until_ready(y)
    both()
    t_both, ts_both = best(both)
    overlap = (t_up + t_exec - t_both) / min(t_up, t_exec)
    rec["overlap"] = {
        "upload_ms": round(t_up * 1e3, 1),
        "exec_ms": round(t_exec * 1e3, 1),
        "both_ms": round(t_both * 1e3, 1),
        "serial_sum_ms": round((t_up + t_exec) * 1e3, 1),
        # 1.0 = full overlap (both == max of the two); 0.0 = fully serial
        "overlap_fraction": round(max(0.0, min(1.0, overlap)), 3),
        "reps_s": [round(x, 4) for x in ts_both],
    }
    print(f"# overlap: up {t_up*1e3:.1f} + exec {t_exec*1e3:.1f} "
          f"-> both {t_both*1e3:.1f} ms (fraction {overlap:.2f})",
          file=sys.stderr)

    # --- 3. d2h split scaling ----------------------------------------
    # IMPORTANT: pull a COMPUTED output (an uploaded array keeps a host
    # copy in the client and np.asarray returns it without any transfer —
    # r5 first run measured a bogus 68 GB/s that way).  Each rep computes
    # a fresh salted result so no host cache can exist.
    base = jnp.asarray(blob)
    add = jax.jit(lambda x, s: x + s)
    d2h = {}
    salt = [0]
    for k in (1, 2, 4):
        def down(k=k):
            salt[0] = (salt[0] + 1) % 250
            dev = add(base, np.uint8(salt[0]))
            jax.block_until_ready(dev)
            t0 = time.perf_counter()
            parts = [dev[i * (PAYLOAD // k):(i + 1) * (PAYLOAD // k)]
                     for i in range(k)]
            futs = [pools[max(k, 1)].submit(np.asarray, p) for p in parts]
            [f.result() for f in futs]
            return time.perf_counter() - t0
        down()
        t = min(down() for _ in range(3))
        d2h[str(k)] = {"s": round(t, 4), "mb_s": round(PAYLOAD / MB / t, 1)}
        print(f"# d2h split={k}: {PAYLOAD/MB/t:8.1f} MB/s", file=sys.stderr)
    rec["d2h_split"] = d2h

    with open(os.path.join(_HERE, "PROFILE_transport_r05.json"), "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps({"h2d_best_split": max(h2d, key=lambda k: h2d[k]["mb_s"]),
                      "overlap_fraction": rec["overlap"]["overlap_fraction"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
