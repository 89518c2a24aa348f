"""Pipeline/scheduler stress — the analog of the reference's threads_test
(synthetic I/P/B DAGs, 8 workers, timeout-based deadlock detection;
reference: test/gtest/threads/threads_test.cpp:14-15,73-74).

Here the schedulable units are GOP chunks on the reconstruction worker
thread plus the display-reorder FIFO; the hazards are deadlock (worker
join vs staging-slot guards), state leakage across reset(), and
back-pressure starvation.  Each workload runs under a WATCHDOG — a detached
worker thread with a future timeout, the reference's CHECK_TIMEOUT
discipline (test/gtest/threads/threads_test_common.hpp:52-61) — so a
deadlock FAILS the test instead of hanging pytest.  Results are verified
bit-exact against the golden decoder.
"""
import concurrent.futures
import time

import numpy as np
import pytest

from m2v_encoder import encode_stream, random_picture
from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder, headers as H
from tiny_mp2v_dec_tpu.golden.decoder import decode_stream

TIMEOUT_S = 300.0


def _watchdog(fn, timeout=TIMEOUT_S):
    """Run ``fn`` on a detached thread; a hang FAILS the test at ``timeout``
    (the worker is daemonic, so a wedged decode doesn't block interpreter
    exit either)."""
    ex = concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="stress-watchdog")
    try:
        fut = ex.submit(fn)
        try:
            return fut.result(timeout=timeout)
        except concurrent.futures.TimeoutError:
            pytest.fail(f"deadlock: workload exceeded {timeout:.0f}s watchdog")
    finally:
        ex.shutdown(wait=False)


def _long_stream(n_pics, seed=9, mbw=2, mbh=2):
    rng = np.random.default_rng(seed)
    pcts = [H.PCT_I]
    while len(pcts) < n_pics:
        pcts += [H.PCT_P, H.PCT_B, H.PCT_B]
    pcts = pcts[:n_pics]
    pics = []
    for i, pct in enumerate(pcts):
        p = random_picture(rng, mbw, mbh, H.CHROMA_420, pct)
        p.temporal_reference = i
        pics.append(p)
    return encode_stream(mbw * 16, mbh * 16, H.CHROMA_420, pics)


def test_many_chunks_through_worker_bitexact():
    """96 pictures through 24 gop_chunk=4 worker jobs: no deadlock, frames
    bit-exact and complete."""
    data = _long_stream(96)
    exp = decode_stream(data)
    dec = MP2VDecoder(DecoderConfig(gop_chunk=4))
    got = _watchdog(lambda: dec.decode(data))
    assert len(got) == len(exp) == 96
    for a, b in zip(exp, got):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.u, b.u)
        np.testing.assert_array_equal(a.v, b.v)


def test_repeated_flush_reset_cycles():
    """100 consecutive decode/reset cycles (reference: threads_test's 100
    flushes) — the worker pool, staging slots and reorder state must
    recycle cleanly every time."""
    data = _long_stream(8, seed=21)
    exp = decode_stream(data)
    dec = MP2VDecoder(DecoderConfig(gop_chunk=4))

    def run():
        for i in range(100):
            got = dec.decode(data)
            assert len(got) == 8, f"cycle {i}"
            dec.reset()
        return got

    got = _watchdog(run)
    for a, b in zip(exp, got):
        np.testing.assert_array_equal(a.y, b.y)


def test_small_pool_backpressure():
    """pictures_pool_size=1 (max back-pressure) must still complete and
    stay bit-exact."""
    data = _long_stream(24, seed=33)
    exp = decode_stream(data)
    dec = MP2VDecoder(DecoderConfig(gop_chunk=4, pictures_pool_size=1))
    got = _watchdog(lambda: dec.decode(data))
    assert len(got) == len(exp)
    for a, b in zip(exp, got):
        np.testing.assert_array_equal(a.y, b.y)
