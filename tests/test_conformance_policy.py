"""Conformance-policy streams decoded END-TO-END against hand-constructed
spec expectations (ISO/IEC 13818-2) — the cases where this decoder
deliberately follows the SPEC and therefore cannot be validated against the
reference binary (see tests/test_reference_bitexact.py docstring):

* concealment_motion_vectors=1: Table 6-17 codes ONE concealment vector
  (motion_vector_count=1, frame motion) per intra MB; the reference parses
  two (reference: src/core/mb_decoder.cpp:567-574), desyncing the cursor.
  Expectations here are constructed from the spec, not from any decoder:
  (a) concealment vectors must not change intra reconstruction — a cmv
  stream and a plain twin with identical block payloads decode identically;
  (b) concealment vectors DO update the PMV predictors and cmv-intra MBs do
  NOT reset them (7.6.3.9, Table 7-9) — pinned by a twin pair whose
  explicit deltas land on the same final motion vector through different
  predictor chains.
* intra first-AC coefficients: B.14's dct_coefficient_first short form
  ('1s') applies only to NON-intra blocks; for intra blocks (with
  intra_vlc_format=0) the first AC uses the normal table, where '11'+sign
  is (run 0, level ±1) and '10' is EOB.  The reference applies the short
  form to intra blocks too (reference: src/core/mb_decoder.cpp:76-88).
  Pinned by decoding an intra block whose first AC is coded '11s' and
  comparing the pixels against the spec's own floating-point IDCT
  (Annex A) of the hand-dequantized coefficients — a desynced parse
  cannot land within the IEEE-1180-style tolerance.
"""
import numpy as np
import pytest

from m2v_encoder import MBSpec, PictureSpec, SliceSpec, encode_stream
from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder, headers as H


def _decode(data):
    dec = MP2VDecoder(DecoderConfig())
    return dec.decode(data)


def _intra_mb(dcs, blocks=None, n_blocks=6):
    """All-intra MB: dcs = (luma_dc, cb_dc, cr_dc); blocks overrides
    {block_index: (dc, [(run, level), ...])}."""
    mb = MBSpec(intra=True)
    mb.blocks = {b: (dcs[0] if b < 4 else dcs[1 + ((b - 4) & 1)], [])
                 for b in range(n_blocks)}
    if blocks:
        mb.blocks.update(blocks)
    return mb


def _spec_idct_f(F):
    """Annex A floating-point inverse DCT (the spec's defining equation)."""
    u = np.arange(8)
    C = np.where(u == 0, 1 / np.sqrt(2), 1.0)
    cos = np.cos((2 * u[:, None] + 1) * u[None, :] * np.pi / 16)  # [x, u]
    # f(y, x) = 1/4 sum_u sum_v C(u)C(v) F(v, u_row?) ... F is [v][u] with
    # v vertical frequency: f = 0.25 * (cos @ (C*C[:,None]*F) @ cos.T)
    W = (C[:, None] * C[None, :]) * F
    return 0.25 * cos @ W @ cos.T


# ---------------------------------------------------------------------------
# Concealment motion vectors
# ---------------------------------------------------------------------------

def test_cmv_single_vector_cursor_integrity():
    """An I picture whose intra MBs carry nonzero concealment vectors must
    decode exactly like the plain twin with identical block payloads: the
    single-vector+marker parse (Table 6-17) keeps the cursor in sync, and
    concealment data never touches intra reconstruction (7.6.3.9)."""
    mbw, mbh = 4, 2

    def build(cmv):
        pic = PictureSpec(picture_coding_type=H.PCT_I,
                          concealment_motion_vectors=cmv,
                          f_code=((2, 2), (2, 2)) if cmv
                          else ((15, 15), (15, 15)))
        for row in range(mbh):
            sl = SliceSpec(mb_row=row, qscale_code=16)
            for col in range(mbw):
                i = row * mbw + col
                mb = _intra_mb((40 + 13 * i, 60 + 7 * i, 200 - 9 * i),
                               blocks={0: (40 + 13 * i, [(0, 2), (3, 5)])})
                if cmv:
                    # distinct deltas per MB keep the predictor chain busy
                    mb.mv_deltas[(0, 0)] = ((col - 1), (row * 2 - 1))
                sl.macroblocks.append(mb)
            pic.slices.append(sl)
        return encode_stream(mbw * 16, mbh * 16, H.CHROMA_420, [pic])

    fa = _decode(build(cmv=1))
    fb = _decode(build(cmv=0))
    assert len(fa) == len(fb) == 1
    assert fa[0].tobytes() == fb[0].tobytes()


def test_cmv_updates_predictors_and_skips_reset():
    """7.6.3.9/Table 7-9: concealment deltas advance PMV[0][0] and a
    cmv-intra MB does not reset the predictors.  Streams A and B reach the
    same final motion vector for the probe MB through different predictor
    chains, so their decodes must be pixel-identical."""
    mbw, mbh = 4, 2
    dx0, dy0 = 4, 2        # MB0 delta: PMV becomes (4, 2)
    dxc, dyc = 2, 2        # concealment delta: PMV becomes (6, 4)

    def ref_picture():
        pic = PictureSpec(picture_coding_type=H.PCT_I)
        for row in range(mbh):
            sl = SliceSpec(mb_row=row, qscale_code=16)
            for col in range(mbw):
                i = row * mbw + col
                sl.macroblocks.append(_intra_mb(
                    (30 + 17 * i, 50 + 11 * i, 220 - 13 * i),
                    blocks={1: (30 + 17 * i, [(0, 3), (1, 4)]),
                            2: (30 + 17 * i, [(2, 6)])}))
            pic.slices.append(sl)
        return pic

    def p_picture(use_cmv):
        pic = PictureSpec(picture_coding_type=H.PCT_P,
                          f_code=((2, 2), (2, 2)),
                          concealment_motion_vectors=1 if use_cmv else 0)
        # row 0: the probe chain
        sl = SliceSpec(mb_row=0, qscale_code=16)
        mb0 = MBSpec(fwd=True)
        mb0.mv_deltas[(0, 0)] = (dx0, dy0)
        sl.macroblocks.append(mb0)
        mb1 = _intra_mb((128, 128, 128))
        if use_cmv:
            mb1.mv_deltas[(0, 0)] = (dxc, dyc)      # PMV -> (6, 4)
        sl.macroblocks.append(mb1)
        mb2 = MBSpec(fwd=True)
        # A: predictor survived as (6, 4), delta 0 keeps it;
        # B: plain intra reset it to (0, 0), so code the full vector
        mb2.mv_deltas[(0, 0)] = (0, 0) if use_cmv else (dx0 + dxc, dy0 + dyc)
        sl.macroblocks.append(mb2)
        mb3 = MBSpec(fwd=True)
        mb3.mv_deltas[(0, 0)] = (-2, -1)            # rides the same PMV
        sl.macroblocks.append(mb3)
        pic.slices.append(sl)
        # row 1: plain zero-MV copy so every row has a slice
        sl = SliceSpec(mb_row=1, qscale_code=16)
        for col in range(mbw):
            mb = MBSpec(fwd=True)
            mb.mv_deltas[(0, 0)] = (0, 0)
            sl.macroblocks.append(mb)
        pic.slices.append(sl)
        return pic

    def build(use_cmv):
        pics = [ref_picture(), p_picture(use_cmv)]
        for i, p in enumerate(pics):
            p.temporal_reference = i
        return encode_stream(mbw * 16, mbh * 16, H.CHROMA_420, pics)

    fa = _decode(build(True))
    fb = _decode(build(False))
    assert len(fa) == len(fb) == 2
    # sanity: the probe MV actually moved pixels (a broken MC would often
    # still satisfy A==B trivially if both were zero)
    p_frame = next(f for f in fa if f.temporal_reference == 1)
    i_frame = next(f for f in fa if f.temporal_reference == 0)
    probe = np.asarray(p_frame.y)[0:16, 32:48]
    same_pos = np.asarray(i_frame.y)[0:16, 32:48]
    assert not np.array_equal(probe, same_pos)
    for a, b in zip(fa, fb):
        assert a.tobytes() == b.tobytes()


# ---------------------------------------------------------------------------
# Intra first-AC coefficient coding (B.14 short-form exclusion)
# ---------------------------------------------------------------------------

def test_intra_first_ac_normal_table_vs_spec_idct():
    """Intra block whose first AC is (run 0, level 1), coded '11'+sign per
    the normal B.14 table.  The decoded pixels must match the spec's
    floating-point IDCT of the hand-dequantized coefficients within the
    IEEE-1180-style tolerance, and the NEXT macroblock (the desync canary)
    must come out as its flat hand-coded DC."""
    mbw, mbh = 2, 1
    qscale_code = 16                       # q_scale_type=0 -> qs = 32
    pic = PictureSpec(picture_coding_type=H.PCT_I)
    sl = SliceSpec(mb_row=0, qscale_code=qscale_code)
    # MB0 block 0: DC 128, first AC (0, 1) -> '11s' (NOT the "first" short
    # form, which 13818-2 reserves for non-intra blocks)
    sl.macroblocks.append(_intra_mb((128, 128, 128),
                                    blocks={0: (128, [(0, 1)])}))
    # MB1: flat canary
    sl.macroblocks.append(_intra_mb((200, 90, 160)))
    pic.slices.append(sl)
    data = encode_stream(mbw * 16, mbh * 16, H.CHROMA_420, [pic])

    frames = _decode(data)
    assert len(frames) == 1
    y = np.asarray(frames[0].y)

    # hand-dequantization (7.4.2.3): F[0] = dc * 8 (precision 0); the AC at
    # zigzag position 1 = raster (0, 1): (level * W * qs) >> 4 with the
    # default intra matrix's 16 there; mismatch control (7.4.4) flips F[7][7]
    F = np.zeros((8, 8))
    F[0, 0] = 128 * 8
    F[0, 1] = (1 * 16 * 32) >> 4
    F[7, 7] = 1                            # parity of 32 is even -> toggle
    expect = np.clip(np.round(_spec_idct_f(F)), 0, 255)
    got = y[0:8, 0:8].astype(np.float64)
    assert np.max(np.abs(got - expect)) <= 2.0

    # remaining MB0 luma blocks are flat DC 128
    assert np.max(np.abs(y[0:16, 8:16].astype(int) - 128)) <= 2
    # canary MB: flat 200 luma / 90 / 160 chroma
    assert np.max(np.abs(y[0:16, 16:32].astype(int) - 200)) <= 2
    u = np.asarray(frames[0].u)
    v = np.asarray(frames[0].v)
    assert np.max(np.abs(u[0:8, 8:16].astype(int) - 90)) <= 2
    assert np.max(np.abs(v[0:8, 8:16].astype(int) - 160)) <= 2


def test_intra_dc_only_block_immediate_eob():
    """A DC-only intra block is DC + immediate EOB ('10').  A decoder that
    misapplied the B.14 first-coefficient short form would consume '10' as
    a coefficient and desync; the canary MB pins the cursor."""
    mbw, mbh = 2, 1
    pic = PictureSpec(picture_coding_type=H.PCT_I)
    sl = SliceSpec(mb_row=0, qscale_code=16)
    sl.macroblocks.append(_intra_mb((77, 133, 99)))
    sl.macroblocks.append(_intra_mb((180, 40, 210)))
    pic.slices.append(sl)
    data = encode_stream(mbw * 16, mbh * 16, H.CHROMA_420, [pic])
    frames = _decode(data)
    y = np.asarray(frames[0].y)
    assert np.max(np.abs(y[:, 0:16].astype(int) - 77)) <= 2
    assert np.max(np.abs(y[:, 16:32].astype(int) - 180)) <= 2
