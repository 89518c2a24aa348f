"""End-to-end tests of the golden decoder on synthetic streams."""
import numpy as np
import pytest

from m2v_encoder import (
    MBSpec, PictureSpec, SliceSpec, encode_stream, random_picture)
from tiny_mp2v_dec_tpu import headers as H
from tiny_mp2v_dec_tpu.golden.decoder import decode_stream


def _flat_intra_picture(mb_w, mb_h, n_blocks, dc_fn):
    pic = PictureSpec(picture_coding_type=H.PCT_I)
    for row in range(mb_h):
        sl = SliceSpec(mb_row=row, qscale_code=8)
        for col in range(mb_w):
            mb = MBSpec(intra=True)
            mb.blocks = {b: (dc_fn(row, col, b), []) for b in range(n_blocks)}
            sl.macroblocks.append(mb)
        pic.slices.append(sl)
    return pic


def test_flat_intra_picture_420():
    # DC-only intra blocks at precision 0 reconstruct to (near-)flat blocks
    # at the DC value; the fixed-point IDCT truncates, so allow 1 LSB.
    mb_w = mb_h = 2
    dc = lambda r, c, b: 50 + 60 * (2 * r + c) + b
    pic = _flat_intra_picture(mb_w, mb_h, 6, dc)
    data = encode_stream(32, 32, H.CHROMA_420, [pic])
    frames = decode_stream(data)
    assert len(frames) == 1
    f = frames[0]
    assert f.y.shape == (32, 32) and f.u.shape == (16, 16)

    def near(tile, value):
        d = tile.astype(int) - value
        assert np.abs(d).max() <= 1, (tile, value)

    for r in range(mb_h):
        for c in range(mb_w):
            base = 50 + 60 * (2 * r + c)
            y_tile = f.y[16 * r:16 * r + 16, 16 * c:16 * c + 16]
            near(y_tile[:8, :8], base)
            near(y_tile[:8, 8:], base + 1)
            near(y_tile[8:, :8], base + 2)
            near(y_tile[8:, 8:], base + 3)
            near(f.u[8 * r:8 * r + 8, 8 * c:8 * c + 8], base + 4)
            near(f.v[8 * r:8 * r + 8, 8 * c:8 * c + 8], base + 5)


def test_p_skip_and_zero_mv_copies_reference():
    mb_w, mb_h = 4, 2
    ipic = _flat_intra_picture(mb_w, mb_h, 6, lambda r, c, b: 10 + 7 * (mb_w * r + c))
    ppic = PictureSpec(picture_coding_type=H.PCT_P, temporal_reference=1,
                       f_code=((2, 2), (15, 15)))
    for row in range(mb_h):
        sl = SliceSpec(mb_row=row, qscale_code=8)
        # first MB: fwd, zero MV, no residual; middle two skipped; last: fwd
        sl.macroblocks.append(MBSpec(fwd=True))
        last = MBSpec(fwd=True, skip_before=2)
        sl.macroblocks.append(last)
        pic_mbs = sl.macroblocks
        pic_mbs[0].mv_deltas[(0, 0)] = (0, 0)
        last.mv_deltas[(0, 0)] = (0, 0)
        ppic.slices.append(sl)
    data = encode_stream(64, 32, H.CHROMA_420, [ipic, ppic])
    frames = decode_stream(data)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0].y, frames[1].y)
    np.testing.assert_array_equal(frames[0].u, frames[1].u)
    np.testing.assert_array_equal(frames[0].v, frames[1].v)


def test_p_motion_shift():
    # P picture with uniform +2 full-pel horizontal MV must shift the image.
    mb_w, mb_h = 4, 2
    ipic = _flat_intra_picture(mb_w, mb_h, 6,
                               lambda r, c, b: 16 * (mb_w * r + c) + 2 * b)
    ppic = PictureSpec(picture_coding_type=H.PCT_P, temporal_reference=1,
                       f_code=((2, 2), (15, 15)))
    for row in range(mb_h):
        sl = SliceSpec(mb_row=row, qscale_code=8)
        for col in range(mb_w):
            mb = MBSpec(fwd=True)
            # -4 half-pel = shift content right? MV is source offset: src = dst + mv
            mb.mv_deltas[(0, 0)] = (4, 0) if col == 0 else (0, 0)  # PMV carries
            sl.macroblocks.append(mb)
        ppic.slices.append(sl)
    data = encode_stream(64, 32, H.CHROMA_420, [ipic, ppic])
    f0, f1 = decode_stream(data)
    # mv = +4 half-pel = +2 px: prediction reads ref at x+2.  The last MB
    # column's window leaves the picture (illegal MV -> clamped), so compare
    # only where the source window is fully inside.
    np.testing.assert_array_equal(f1.y[:, :46], f0.y[:, 2:48])


def test_b_reorder_display_order():
    mb_w, mb_h = 2, 1
    i0 = _flat_intra_picture(mb_w, mb_h, 6, lambda r, c, b: 10)
    i0.temporal_reference = 0
    p3 = PictureSpec(picture_coding_type=H.PCT_P, temporal_reference=2,
                     f_code=((2, 2), (15, 15)))
    sl = SliceSpec(mb_row=0, qscale_code=8)
    sl.macroblocks = [MBSpec(fwd=True), MBSpec(fwd=True)]
    p3.slices.append(sl)
    b1 = PictureSpec(picture_coding_type=H.PCT_B, temporal_reference=1,
                     f_code=((2, 2), (2, 2)))
    sl = SliceSpec(mb_row=0, qscale_code=8)
    sl.macroblocks = [MBSpec(fwd=True, bwd=True), MBSpec(fwd=True, bwd=True)]
    b1.slices.append(sl)
    data = encode_stream(32, 16, H.CHROMA_420, [i0, p3, b1])
    frames = decode_stream(data, reordering=True)
    assert [f.temporal_reference for f in frames] == [0, 1, 2]
    frames = decode_stream(data, reordering=False)
    assert [f.temporal_reference for f in frames] == [0, 2, 1]


@pytest.mark.parametrize("cf", [H.CHROMA_420, H.CHROMA_422, H.CHROMA_444])
def test_random_stream_decodes_deterministically(cf):
    rng = np.random.default_rng(1729 + cf)
    mb_w, mb_h = 3, 2
    pics = [
        random_picture(rng, mb_w, mb_h, cf, H.PCT_I),
        random_picture(rng, mb_w, mb_h, cf, H.PCT_P),
        random_picture(rng, mb_w, mb_h, cf, H.PCT_B),
    ]
    for i, p in enumerate(pics):
        p.temporal_reference = [0, 2, 1][i]
    data = encode_stream(mb_w * 16, mb_h * 16, cf, pics)
    f1 = decode_stream(data)
    f2 = decode_stream(data)
    assert len(f1) == 3
    for a, b in zip(f1, f2):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.u, b.u)
        np.testing.assert_array_equal(a.v, b.v)


@pytest.mark.parametrize("opts", [
    dict(q_scale_type=1), dict(intra_vlc_format=1), dict(alternate_scan=1),
    dict(intra_dc_precision=2), dict(fpfd=False),
    dict(fpfd=False, allow_field_motion=True),
])
def test_random_stream_feature_matrix(opts):
    rng = np.random.default_rng(sum(map(ord, str(opts))))
    mb_w, mb_h = 3, 2
    pics = [
        random_picture(rng, mb_w, mb_h, H.CHROMA_420, H.PCT_I, **opts),
        random_picture(rng, mb_w, mb_h, H.CHROMA_420, H.PCT_P, **opts),
    ]
    data = encode_stream(mb_w * 16, mb_h * 16, H.CHROMA_420, pics)
    frames = decode_stream(data)
    assert len(frames) == 2
    assert frames[0].y.shape == (32, 48)
