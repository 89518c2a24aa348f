"""Bit I/O and header parse<->write round-trips."""
import random

import numpy as np
import pytest

from tiny_mp2v_dec_tpu import headers as H
from tiny_mp2v_dec_tpu.utils.bits import BitReader, BitWriter

RNG = random.Random(31337)


def test_bitreader_basic():
    data = bytes([0b10110011, 0b01010101, 0xFF, 0x00])
    r = BitReader(data)
    assert r.peek(3) == 0b101
    assert r.read(3) == 0b101
    assert r.read(5) == 0b10011
    assert r.read(8) == 0b01010101
    assert r.read(12) == 0xFF0
    assert r.peek(16) == 0  # past-the-end reads zero


def test_bitwriter_roundtrip():
    w = BitWriter()
    vals = [(RNG.getrandbits(n), n) for n in (1, 3, 7, 12, 18, 25, 32, 5, 1)]
    for v, n in vals:
        w.write(v, n)
    w.align()
    r = BitReader(w.getvalue())
    for v, n in vals:
        assert r.read(n) == v


def _roundtrip_after_startcode(obj, write_args=(), parse=None, skip_ext_id=False):
    w = BitWriter()
    obj.write(w, *write_args)
    w.align()
    data = w.getvalue()
    assert data[:3] == b"\x00\x00\x01"
    r = BitReader(data, bit_pos=32)
    if skip_ext_id:
        r.skip(4)
    return parse(r)


def test_sequence_header_roundtrip():
    sh = H.SequenceHeader(
        horizontal_size_value=1920, vertical_size_value=1088,
        aspect_ratio_information=3, frame_rate_code=4,
        bit_rate_value=12345, vbv_buffer_size_value=112,
        load_intra_quantiser_matrix=1,
        intra_quantiser_matrix=np.arange(1, 65, dtype=np.uint8),
        load_non_intra_quantiser_matrix=1,
        non_intra_quantiser_matrix=np.arange(64, 0, -1, dtype=np.uint8),
    )
    got = _roundtrip_after_startcode(sh, parse=H.SequenceHeader.parse)
    assert got.horizontal_size_value == 1920
    assert got.vertical_size_value == 1088
    np.testing.assert_array_equal(got.intra_quantiser_matrix, sh.intra_quantiser_matrix)
    np.testing.assert_array_equal(got.non_intra_quantiser_matrix, sh.non_intra_quantiser_matrix)


def test_sequence_extension_roundtrip():
    se = H.SequenceExtension(chroma_format=H.CHROMA_422, progressive_sequence=0,
                             horizontal_size_extension=1, bit_rate_extension=77)
    got = _roundtrip_after_startcode(se, parse=H.SequenceExtension.parse, skip_ext_id=True)
    assert got == se


def test_gop_picture_roundtrip():
    g = H.GroupOfPicturesHeader(time_code=12345, closed_gop=1, broken_link=0)
    got = _roundtrip_after_startcode(g, parse=H.GroupOfPicturesHeader.parse)
    assert got == g

    for pct in (H.PCT_I, H.PCT_P, H.PCT_B):
        p = H.PictureHeader(temporal_reference=7, picture_coding_type=pct,
                            vbv_delay=0xABCD, forward_f_code=3, backward_f_code=2)
        got = _roundtrip_after_startcode(p, parse=H.PictureHeader.parse)
        assert got.picture_coding_type == pct
        assert got.temporal_reference == 7
        if pct != H.PCT_I:
            assert got.forward_f_code == 3
        if pct == H.PCT_B:
            assert got.backward_f_code == 2


def test_picture_coding_extension_roundtrip():
    e = H.PictureCodingExtension(
        f_code=((2, 3), (4, 5)), intra_dc_precision=2,
        picture_structure=H.PS_FRAME, frame_pred_frame_dct=0,
        concealment_motion_vectors=1, q_scale_type=1, intra_vlc_format=1,
        alternate_scan=1, progressive_frame=0,
        composite_display_flag=1, field_sequence=5, burst_amplitude=99)
    got = _roundtrip_after_startcode(e, parse=H.PictureCodingExtension.parse,
                                     skip_ext_id=True)
    assert got == e


def test_quant_matrix_extension_roundtrip():
    e = H.QuantMatrixExtension(
        load_intra_quantiser_matrix=1,
        intra_quantiser_matrix=np.arange(2, 66, dtype=np.uint8),
        load_chroma_non_intra_quantiser_matrix=1,
        chroma_non_intra_quantiser_matrix=np.full(64, 9, dtype=np.uint8))
    got = _roundtrip_after_startcode(e, parse=H.QuantMatrixExtension.parse,
                                     skip_ext_id=True)
    np.testing.assert_array_equal(got.intra_quantiser_matrix, e.intra_quantiser_matrix)
    np.testing.assert_array_equal(got.chroma_non_intra_quantiser_matrix,
                                  e.chroma_non_intra_quantiser_matrix)
    assert got.load_non_intra_quantiser_matrix == 0


def test_slice_header_roundtrip():
    s = H.SliceHeader(slice_vertical_position=0x2A, quantiser_scale_code=17,
                      intra_slice_flag=1, intra_slice=1, slice_picture_id=33,
                      slice_picture_id_enable=1)
    w = BitWriter()
    s.write(w, vertical_size=1088)
    w.align()
    data = w.getvalue()
    got = H.SliceHeader.parse(BitReader(data, 32), start_code=data[3],
                              vertical_size=1088)
    assert got.quantiser_scale_code == 17
    assert got.mb_row == 0x2A - 1
    assert got.intra_slice == 1
    assert got.slice_picture_id == 33


def test_quantiser_scale_table():
    # Table 7-6 spot checks
    assert H.quantiser_scale_from_code(1, 0) == 2
    assert H.quantiser_scale_from_code(31, 0) == 62
    assert H.quantiser_scale_from_code(1, 1) == 1
    assert H.quantiser_scale_from_code(8, 1) == 8
    assert H.quantiser_scale_from_code(9, 1) == 10
    assert H.quantiser_scale_from_code(16, 1) == 24
    assert H.quantiser_scale_from_code(17, 1) == 28
    assert H.quantiser_scale_from_code(24, 1) == 56
    assert H.quantiser_scale_from_code(25, 1) == 64
    assert H.quantiser_scale_from_code(31, 1) == 112


def test_build_quant_matrices_defaults():
    from tiny_mp2v_dec_tpu.utils.scan import (
        DEFAULT_INTRA_QUANT_MATRIX, DEFAULT_NON_INTRA_QUANT_MATRIX, dezigzag)
    seq = H.SequenceHeader()
    # spec mode: plain raster defaults
    w = H.build_quant_matrices(seq, None, ref_compat=False)
    np.testing.assert_array_equal(w[0], DEFAULT_INTRA_QUANT_MATRIX)
    np.testing.assert_array_equal(w[1], DEFAULT_NON_INTRA_QUANT_MATRIX)
    np.testing.assert_array_equal(w[2], DEFAULT_INTRA_QUANT_MATRIX)
    # ref-compat mode (default): the reference's effective default intra
    # matrix is its raster constant run through the zigzag de-shuffle
    # (reference decoder.cpp:167-176 treats it as a downloaded matrix)
    wr = H.build_quant_matrices(seq, None)
    np.testing.assert_array_equal(wr[0], dezigzag(DEFAULT_INTRA_QUANT_MATRIX))
    np.testing.assert_array_equal(wr[1], DEFAULT_NON_INTRA_QUANT_MATRIX)

    qm = H.QuantMatrixExtension(load_chroma_intra_quantiser_matrix=1,
                                chroma_intra_quantiser_matrix=np.full(64, 5, np.uint8))
    w2 = H.build_quant_matrices(seq, qm, ref_compat=False)
    np.testing.assert_array_equal(w2[0], DEFAULT_INTRA_QUANT_MATRIX)
    np.testing.assert_array_equal(w2[2], np.full(64, 5))


def test_scan_tables_consistency():
    from tiny_mp2v_dec_tpu.utils import scan
    for alt in range(2):
        assert sorted(scan.SCAN_RASTER[alt].tolist()) == list(range(64))
        assert sorted(scan.SCAN_STORE[alt].tolist()) == list(range(64))
        # inverse relationship
        for pos in range(64):
            assert scan.RASTER_TO_SCANPOS[alt, scan.SCAN_RASTER[alt, pos]] == pos
    # zigzag spot checks (Figure 7-2)
    assert scan.SCAN_RASTER[0, 0] == 0
    assert scan.SCAN_RASTER[0, 1] == 1
    assert scan.SCAN_RASTER[0, 2] == 8
    assert scan.SCAN_RASTER[0, 63] == 63
    # alternate scan spot checks (Figure 7-3)
    assert scan.SCAN_RASTER[1, 1] == 8
    assert scan.SCAN_RASTER[1, 63] == 63
