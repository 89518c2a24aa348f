"""Pipeline/scheduler stress — the analog of the reference's threads_test
(synthetic I/P/B DAGs, 8 workers, timeout-based deadlock detection;
reference: test/gtest/threads/threads_test.cpp:14-15,73-74).

Here the schedulable units are GOP chunks on the reconstruction worker
thread plus the display-reorder FIFO; the hazards are deadlock (worker
join vs staging-slot guards), state leakage across reset(), and
back-pressure starvation.  Everything is bounded by pytest-level timeouts
via signal-free wall-clock asserts and verified bit-exact against the
golden decoder.
"""
import time

import numpy as np

from m2v_encoder import encode_stream, random_picture
from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder, headers as H
from tiny_mp2v_dec_tpu.golden.decoder import decode_stream

TIMEOUT_S = 300.0


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
    t0 = time.perf_counter()
    got = dec.decode(data)
    assert time.perf_counter() - t0 < TIMEOUT_S
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
    t0 = time.perf_counter()
    for i in range(100):
        got = dec.decode(data)
        assert len(got) == 8, f"cycle {i}"
        dec.reset()
    assert time.perf_counter() - t0 < TIMEOUT_S
    for a, b in zip(exp, got):
        np.testing.assert_array_equal(a.y, b.y)


def test_small_pool_backpressure():
    """pictures_pool_size=1 (max back-pressure) must still complete and
    stay bit-exact."""
    data = _long_stream(24, seed=33)
    exp = decode_stream(data)
    dec = MP2VDecoder(DecoderConfig(gop_chunk=4, pictures_pool_size=1))
    got = dec.decode(data)
    assert len(got) == len(exp)
    for a, b in zip(exp, got):
        np.testing.assert_array_equal(a.y, b.y)
