"""VLC encode->decode round-trip fuzzing.

Mirrors the reference's cavlc test pattern (reference:
test/gtest/cavlc/cavlc_test.cpp + test/gtest/common/cavlc_utils.hpp): for
every code word of every Annex-B table, plant the code at the head of a
buffer, fill the tail with seeded random bits, decode, and assert both the
decoded value and the exact consumed bit length.
"""
import random

import numpy as np
import pytest

from tiny_mp2v_dec_tpu.utils.bits import BitReader, BitWriter
from tiny_mp2v_dec_tpu.vlc import lut, tables as T

RNG = random.Random(1729)
N_ITER = 25


def _buf_with_code(code, length, rng=RNG):
    w = BitWriter()
    w.write(code, length)
    for _ in range(8):
        w.write(rng.getrandbits(8), 8)
    w.align()
    return w.getvalue()


def _lut_decode(reader, val_lut, len_lut, maxlen):
    peek = reader.peek(maxlen)
    length = int(len_lut[peek])
    assert length > 0, "invalid code"
    reader.skip(length)
    return int(val_lut[peek])


@pytest.mark.parametrize("value", sorted(T.MBA))
def test_mba_roundtrip(value):
    code, length = T.MBA[value]
    for _ in range(N_ITER):
        r = BitReader(_buf_with_code(code, length))
        got = _lut_decode(r, lut.MBA_VAL, lut.MBA_LEN, lut.MBA_MAXLEN)
        assert got == value and r.pos == length


def test_mba_escape():
    code, length = T.MBA_ESCAPE
    r = BitReader(_buf_with_code(code, length))
    got = _lut_decode(r, lut.MBA_VAL, lut.MBA_LEN, lut.MBA_MAXLEN)
    assert got == lut.MBA_ESC_VALUE and r.pos == length


@pytest.mark.parametrize("pct,table", [(1, T.MB_TYPE_I), (2, T.MB_TYPE_P), (3, T.MB_TYPE_B)])
def test_mb_type_roundtrip(pct, table):
    val_lut, len_lut = lut.MBTYPE[pct]
    for (code, length), flags in table:
        for _ in range(N_ITER):
            r = BitReader(_buf_with_code(code, length))
            got = _lut_decode(r, val_lut, len_lut, lut.MBTYPE_MAXLEN)
            assert got == flags and r.pos == length


@pytest.mark.parametrize("pct,table", [
    (1, T.MB_TYPE_SS_I), (2, T.MB_TYPE_SS_P), (3, T.MB_TYPE_SS_B)])
def test_mb_type_scalable_roundtrip(pct, table):
    val_lut, len_lut = lut.MBTYPE_SS[pct]
    for (code, length), flags in table:
        r = BitReader(_buf_with_code(code, length))
        got = _lut_decode(r, val_lut, len_lut, lut.MBTYPE_MAXLEN)
        assert got == flags and r.pos == length


def test_mb_type_snr_roundtrip():
    val_lut, len_lut = lut.MBTYPE_SNR
    for (code, length), flags in T.MB_TYPE_SNR:
        r = BitReader(_buf_with_code(code, length))
        got = _lut_decode(r, val_lut, len_lut, lut.MBTYPE_MAXLEN)
        assert got == flags and r.pos == length


@pytest.mark.parametrize("value", range(64))
def test_cbp_roundtrip(value):
    code, length = T.CBP[value]
    for _ in range(N_ITER):
        r = BitReader(_buf_with_code(code, length))
        got = _lut_decode(r, lut.CBP_VAL, lut.CBP_LEN, lut.CBP_MAXLEN)
        assert got == value and r.pos == length


@pytest.mark.parametrize("value", sorted(T.MOTION_CODE))
def test_motion_code_roundtrip(value):
    code, length = T.MOTION_CODE[value]
    for _ in range(N_ITER):
        r = BitReader(_buf_with_code(code, length))
        got = _lut_decode(r, lut.MOTION_VAL, lut.MOTION_LEN, lut.MOTION_MAXLEN) - 16
        assert got == value and r.pos == length


@pytest.mark.parametrize("value", [-1, 0, 1])
def test_dmvector_roundtrip(value):
    code, length = T.DMVECTOR[value]
    r = BitReader(_buf_with_code(code, length))
    got = _lut_decode(r, lut.DMV_VAL, lut.DMV_LEN, lut.DMV_MAXLEN) - 1
    assert got == value and r.pos == length


@pytest.mark.parametrize("value", range(12))
def test_dct_size_roundtrip(value):
    for table, val_lut, len_lut in (
        (T.DCT_SIZE_LUMA, lut.DCSIZE_LUMA_VAL, lut.DCSIZE_LUMA_LEN),
        (T.DCT_SIZE_CHROMA, lut.DCSIZE_CHROMA_VAL, lut.DCSIZE_CHROMA_LEN),
    ):
        code, length = table[value]
        r = BitReader(_buf_with_code(code, length))
        got = _lut_decode(r, val_lut, len_lut, lut.DCSIZE_MAXLEN)
        assert got == value and r.pos == length


@pytest.mark.parametrize("table_id", [0, 1])
def test_coeff_roundtrip(table_id):
    table = T.COEFF_ZERO if table_id == 0 else T.COEFF_ONE
    run_lut, lvl_lut, len_lut = (
        (lut.COEFF0_RUN, lut.COEFF0_LVL, lut.COEFF0_LEN) if table_id == 0
        else (lut.COEFF1_RUN, lut.COEFF1_LVL, lut.COEFF1_LEN))
    for code, length, run, level in table:
        for sign in (0, 1):
            w = BitWriter()
            w.write(code, length)
            w.write(sign, 1)
            for _ in range(6):
                w.write(RNG.getrandbits(8), 8)
            w.align()
            r = BitReader(w.getvalue())
            peek = r.peek(lut.COEFF_MAXLEN)
            assert int(len_lut[peek]) == length
            assert int(run_lut[peek]) == run
            assert int(lvl_lut[peek]) == level
            r.skip(length)
            assert r.read(1) == sign


@pytest.mark.parametrize("table_id", [0, 1])
def test_coeff_eob_escape(table_id):
    eob = T.EOB_ZERO if table_id == 0 else T.EOB_ONE
    run_lut, len_lut = (lut.COEFF0_RUN, lut.COEFF0_LEN) if table_id == 0 \
        else (lut.COEFF1_RUN, lut.COEFF1_LEN)
    r = BitReader(_buf_with_code(*eob))
    peek = r.peek(lut.COEFF_MAXLEN)
    assert int(run_lut[peek]) == lut.COEFF_EOB
    assert int(len_lut[peek]) == eob[1]

    r = BitReader(_buf_with_code(*T.COEFF_ESCAPE))
    peek = r.peek(lut.COEFF_MAXLEN)
    assert int(run_lut[peek]) == lut.COEFF_ESC
    assert int(len_lut[peek]) == T.COEFF_ESCAPE[1]


def test_luts_dense_coverage():
    # Every non-reserved 16-bit prefix space entry for B.14 is either a valid
    # code or part of the small reserved/invalid space.
    assert (lut.COEFF0_LEN > 0).sum() > 65000
    assert (lut.COEFF1_LEN > 0).sum() > 65000
