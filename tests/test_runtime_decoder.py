"""Full-pipeline parity: runtime (device) decoder vs golden decoder."""
import numpy as np
import pytest

from m2v_encoder import encode_stream, random_picture
from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder
from tiny_mp2v_dec_tpu import headers as H
from tiny_mp2v_dec_tpu.golden.decoder import decode_stream


def _random_ipb_stream(rng, mb_w, mb_h, cf, **opts):
    pics = [
        random_picture(rng, mb_w, mb_h, cf, H.PCT_I, **opts),
        random_picture(rng, mb_w, mb_h, cf, H.PCT_P, **opts),
        random_picture(rng, mb_w, mb_h, cf, H.PCT_B, **opts),
        random_picture(rng, mb_w, mb_h, cf, H.PCT_P, **opts),
        random_picture(rng, mb_w, mb_h, cf, H.PCT_B, **opts),
    ]
    for p, tr in zip(pics, (0, 2, 1, 4, 3)):
        p.temporal_reference = tr
    return encode_stream(mb_w * 16, mb_h * 16, cf, pics)


def _assert_frames_equal(fa, fb):
    assert len(fa) == len(fb)
    for i, (a, b) in enumerate(zip(fa, fb)):
        assert a.temporal_reference == b.temporal_reference, i
        np.testing.assert_array_equal(a.y, b.y, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(a.u, b.u, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(a.v, b.v, err_msg=f"frame {i} V")


@pytest.mark.parametrize("cf", [H.CHROMA_420, H.CHROMA_422, H.CHROMA_444])
def test_runtime_matches_golden_ipb(cf):
    rng = np.random.default_rng(777 + cf)
    data = _random_ipb_stream(rng, 3, 2, cf)
    gold = decode_stream(data)
    dec = MP2VDecoder(DecoderConfig())
    got = dec.decode(data)
    _assert_frames_equal(gold, got)


def test_runtime_matches_golden_features():
    rng = np.random.default_rng(999)
    data = _random_ipb_stream(rng, 3, 2, H.CHROMA_420, fpfd=False,
                              allow_field_motion=True, q_scale_type=1,
                              intra_vlc_format=1, alternate_scan=1)
    gold = decode_stream(data)
    got = MP2VDecoder(DecoderConfig()).decode(data)
    _assert_frames_equal(gold, got)


def test_runtime_no_reordering_and_renderer_callback():
    rng = np.random.default_rng(31)
    data = _random_ipb_stream(rng, 2, 2, H.CHROMA_420)
    seen = []
    dec = MP2VDecoder(DecoderConfig(reordering=False), renderer=seen.append)
    got = dec.decode(data)
    assert [f.temporal_reference for f in got] == [0, 2, 1, 4, 3]
    assert len(seen) == len(got)


def test_runtime_decoder_reuse():
    rng = np.random.default_rng(32)
    data = _random_ipb_stream(rng, 2, 2, H.CHROMA_420)
    dec = MP2VDecoder(DecoderConfig())
    a = dec.decode(data)
    dec.reset()
    b = dec.decode(data)
    _assert_frames_equal(a, b)


def test_user_data_captured():
    """user_data start codes are captured verbatim (reference:
    decoder.cpp:194-200)."""
    from tiny_mp2v_dec_tpu.headers import BitWriter, USER_DATA_START_CODE

    rng = np.random.default_rng(5)
    data = _random_ipb_stream(rng, 2, 2, H.CHROMA_420)
    # splice a user-data segment right after the sequence extension (before
    # the GOP header start code 0xB8)
    gop_sc = data.index(bytes([0, 0, 1, 0xB8]))
    payload = b"hello-mp2v"  # must not contain a start-code prefix
    ud = bytes([0, 0, 1, USER_DATA_START_CODE]) + payload
    spliced = data[:gop_sc] + ud + data[gop_sc:]
    dec = MP2VDecoder(DecoderConfig())
    frames = dec.decode(spliced)
    assert dec.user_data == [payload]
    # decode result unchanged by the user data
    _assert_frames_equal(decode_stream(spliced), frames)
