"""Error containment (DecoderConfig.on_error="drop_slice").

A corrupt slice must be contained: the decoder keeps that slice's parsed
prefix, every OTHER slice and picture decodes bit-exactly, and
``stats["bad_slices"]`` counts the drop.  The reference decoder, by
contrast, silently decodes garbage on invalid VLCs (its decoders return
nonsense values rather than errors, reference: src/core/mp2v_vlc_dec.hpp:69)
and corrupt data can desync the whole picture; strict mode ("raise",
default) aborts instead — both modes are cleaner than the reference.
"""
import numpy as np
import pytest

from m2v_encoder import random_picture, encode_stream
from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder, headers as H
from tiny_mp2v_dec_tpu.golden.decoder import scan_start_codes


def _stream(seed=5, pattern="IPBBP", mbw=10, mbh=6, cf=H.CHROMA_420):
    rng = np.random.default_rng(seed)
    pcts = [{"I": H.PCT_I, "P": H.PCT_P, "B": H.PCT_B}[c] for c in pattern]
    pics = []
    for i, pct in enumerate(pcts):
        p = random_picture(rng, mbw, mbh, cf, pct)
        p.temporal_reference = i
        pics.append(p)
    return encode_stream(mbw * 16, mbh * 16, cf, pics), pcts


def _corrupt_slice(data: bytes, pic_index: int, slice_index: int) -> bytes:
    """Overwrite bytes inside one slice of one picture with 0xFF (never
    forms a start code; drives the MB parse off the rails)."""
    pic = -1
    slices = []
    for off in (int(o) for o in scan_start_codes(data)):
        code = data[off + 3]
        if code == H.PICTURE_START_CODE:
            pic += 1
        elif H.SLICE_START_CODE_MIN <= code <= H.SLICE_START_CODE_MAX:
            if pic == pic_index:
                slices.append(off)
    off = slices[slice_index]
    buf = bytearray(data)
    # a few bytes past the start code + slice header bits
    buf[off + 6:off + 10] = b"\xff\xff\xff\xff"
    return bytes(buf)


@pytest.mark.parametrize("num_threads", [1, 2])
def test_drop_slice_contains_damage(num_threads):
    data, pcts = _stream()
    # corrupt a slice of the first B picture (decode order index 2):
    # B pictures are not references, so every other frame must be intact
    bad_pic = 2
    assert pcts[bad_pic] == H.PCT_B
    corrupt = _corrupt_slice(data, bad_pic, 3)

    clean = MP2VDecoder(DecoderConfig(num_threads=num_threads)).decode(data)
    dec = MP2VDecoder(DecoderConfig(num_threads=num_threads,
                                    on_error="drop_slice"))
    frames = dec.decode(corrupt)

    assert dec.stats["bad_slices"] >= 1
    assert len(frames) == len(clean)
    n_diff = 0
    for fc, fd in zip(clean, frames):
        assert fc.temporal_reference == fd.temporal_reference
        if fc.tobytes() != fd.tobytes():
            n_diff += 1
            # damage confined to the corrupted B picture
            assert fd.temporal_reference == bad_pic
    assert n_diff <= 1


def test_drop_slice_keeps_other_rows_bitexact():
    """Within the damaged picture, rows other than the corrupt slice's own
    MB row must be bit-exact (the tolerant tokenizer confines a slice's
    writes to its row, 13818-2 6.1.2)."""
    data, pcts = _stream(seed=9)
    bad_pic, bad_slice = 2, 1
    corrupt = _corrupt_slice(data, bad_pic, bad_slice)
    clean = MP2VDecoder(DecoderConfig()).decode(data)
    frames = MP2VDecoder(
        DecoderConfig(on_error="drop_slice")).decode(corrupt)
    fc = next(f for f in clean if f.temporal_reference == bad_pic)
    fd = next(f for f in frames if f.temporal_reference == bad_pic)
    yc, yd = np.asarray(fc.y), np.asarray(fd.y)
    rows = np.flatnonzero((yc != yd).any(axis=1))
    assert rows.size == 0 or (rows // 16 == bad_slice).all()


def test_raise_mode_aborts():
    data, _ = _stream()
    corrupt = _corrupt_slice(data, 2, 3)
    with pytest.raises(ValueError):
        MP2VDecoder(DecoderConfig()).decode(corrupt)


def test_drop_slice_gop_chunk_path():
    """Containment also holds on the chunked (throughput) path."""
    data, pcts = _stream(seed=11, pattern="IPBBPBB")
    corrupt = _corrupt_slice(data, 3, 2)   # second B of the first sub-GOP
    clean = MP2VDecoder(DecoderConfig(gop_chunk=4)).decode(data)
    dec = MP2VDecoder(DecoderConfig(gop_chunk=4, on_error="drop_slice"))
    frames = dec.decode(corrupt)
    assert dec.stats["bad_slices"] >= 1
    assert len(frames) == len(clean)
    diffs = [fd.temporal_reference for fc, fd in zip(clean, frames)
             if fc.tobytes() != fd.tobytes()]
    assert diffs in ([], [3])
