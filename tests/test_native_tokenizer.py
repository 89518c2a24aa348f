"""Native (C++) tokenizer parity vs the Python golden tokenizer.

Pattern per reference cavlc tests scaled to whole streams: randomized valid
pictures across every feature combination; every output tensor must match
exactly.
"""
import numpy as np
import pytest

from m2v_encoder import encode_stream, random_picture
from test_device_recon import _tokens_from_stream
from tiny_mp2v_dec_tpu import headers as H

native = pytest.importorskip("tiny_mp2v_dec_tpu.tokenizer.native")


def _params_and_slices(data):
    """Re-walk the stream and return (params, geom, slices) per picture via
    the shared helper, plus a native tokenization of the same pictures."""
    return _tokens_from_stream(data)


def _native_tokens(data):
    from tiny_mp2v_dec_tpu.golden.decoder import scan_start_codes
    from tiny_mp2v_dec_tpu.tokenizer.types import (
        PictureGeometry, PictureParams, PictureTokens)
    tok = native.native_tokenizer(num_threads=2)
    out = []
    seq = None
    sext = H.SequenceExtension()
    cur = None

    def finish(cur):
        geom = PictureGeometry(seq.horizontal_size_value,
                               seq.vertical_size_value, sext.chroma_format)
        pcext = cur["pcext"]
        params = PictureParams(
            picture_coding_type=cur["header"].picture_coding_type,
            f_code=pcext.f_code,
            intra_dc_precision=pcext.intra_dc_precision,
            picture_structure=pcext.picture_structure,
            frame_pred_frame_dct=pcext.frame_pred_frame_dct,
            concealment_motion_vectors=pcext.concealment_motion_vectors,
            q_scale_type=pcext.q_scale_type,
            intra_vlc_format=pcext.intra_vlc_format,
            alternate_scan=pcext.alternate_scan,
            chroma_format=sext.chroma_format,
            vertical_size=geom.height,
            quant_matrices=H.build_quant_matrices(seq, cur["qmext"]),
        )
        out.append(tok(data, cur["slices"], params, geom))

    for off in scan_start_codes(data):
        off = int(off)
        code = data[off + 3]
        r_pos = (off + 4) * 8
        if code == H.SEQUENCE_HEADER_CODE:
            seq = H.SequenceHeader.parse(H.BitReader(data, r_pos))
        elif code == H.EXTENSION_START_CODE:
            r = H.BitReader(data, r_pos)
            ext_id = r.read(4)
            if ext_id == H.SEQUENCE_EXTENSION_ID:
                sext = H.SequenceExtension.parse(r)
            elif ext_id == H.PICTURE_CODING_EXTENSION_ID and cur:
                cur["pcext"] = H.PictureCodingExtension.parse(r)
            elif ext_id == H.QUANT_MATRIX_EXTENSION_ID and cur:
                cur["qmext"] = H.QuantMatrixExtension.parse(r)
        elif code == H.PICTURE_START_CODE:
            if cur:
                finish(cur)
            cur = {"header": H.PictureHeader.parse(H.BitReader(data, r_pos)),
                   "pcext": H.PictureCodingExtension(), "qmext": None,
                   "slices": []}
        elif H.SLICE_START_CODE_MIN <= code <= H.SLICE_START_CODE_MAX and cur:
            cur["slices"].append((r_pos, code))
    if cur:
        finish(cur)
    return out


def _assert_tokens_equal(a, b, ctx=""):
    # densify coefficients: the native tokenizer's sparse row order is
    # thread-nondeterministic, the scattered result must be identical
    np.testing.assert_array_equal(a.dense_coeff(), b.dense_coeff(),
                                  err_msg=f"{ctx}: coeff")
    for name in ("intra", "fwd", "bwd", "field_pred", "dct_type",
                 "mv", "mvfs", "coded"):
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=f"{ctx}: {name}")


@pytest.mark.parametrize("cf", [H.CHROMA_420, H.CHROMA_422, H.CHROMA_444])
@pytest.mark.parametrize("pct", [H.PCT_I, H.PCT_P, H.PCT_B])
def test_native_parity_basic(cf, pct):
    rng = np.random.default_rng(4000 + 10 * cf + pct)
    pic = random_picture(rng, 5, 4, cf, pct)
    data = encode_stream(80, 64, cf, [pic])
    golden = _tokens_from_stream(data)
    nat = _native_tokens(data)
    for i, (g, n) in enumerate(zip(golden, nat)):
        _assert_tokens_equal(g, n, f"cf={cf} pct={pct} pic={i}")


@pytest.mark.parametrize("opts", [
    dict(fpfd=False),
    dict(fpfd=False, allow_field_motion=True),
    dict(q_scale_type=1), dict(intra_vlc_format=1), dict(alternate_scan=1),
    dict(intra_dc_precision=2), dict(intra_dc_precision=3),
    dict(cmv=1),
])
def test_native_parity_features(opts):
    rng = np.random.default_rng(sum(map(ord, str(opts))) * 7)
    pcts = [H.PCT_I, H.PCT_P, H.PCT_B] if "cmv" not in opts else [H.PCT_I]
    pics = [random_picture(rng, 4, 3, H.CHROMA_420, pct, **opts) for pct in pcts]
    data = encode_stream(64, 48, H.CHROMA_420, pics)
    golden = _tokens_from_stream(data)
    nat = _native_tokens(data)
    for i, (g, n) in enumerate(zip(golden, nat)):
        _assert_tokens_equal(g, n, f"{opts} pic={i}")


def test_native_parity_fuzz_many_seeds():
    for seed in range(20):
        rng = np.random.default_rng(90000 + seed)
        cf = [H.CHROMA_420, H.CHROMA_422, H.CHROMA_444][seed % 3]
        pct = [H.PCT_I, H.PCT_P, H.PCT_B][seed % 3]
        opts = dict(fpfd=bool(seed % 2), q_scale_type=seed % 2,
                    intra_vlc_format=(seed // 2) % 2,
                    alternate_scan=(seed // 3) % 2,
                    allow_field_motion=bool(seed % 2))
        pic = random_picture(rng, 3, 3, cf, pct, **opts)
        data = encode_stream(48, 48, cf, [pic])
        golden = _tokens_from_stream(data)
        nat = _native_tokens(data)
        _assert_tokens_equal(golden[0], nat[0], f"seed={seed}")


def test_native_error_on_garbage():
    from tiny_mp2v_dec_tpu.tokenizer.types import (
        PictureGeometry, PictureParams)
    tok = native.native_tokenizer()
    geom = PictureGeometry(32, 32, 1)
    params = PictureParams(
        picture_coding_type=1, f_code=((15, 15), (15, 15)),
        intra_dc_precision=0, picture_structure=3, frame_pred_frame_dct=1,
        concealment_motion_vectors=0, q_scale_type=0, intra_vlc_format=0,
        alternate_scan=0, chroma_format=1, vertical_size=32,
        quant_matrices=np.full((4, 64), 16, np.uint8))
    garbage = bytes([0, 0, 1, 1]) + bytes(40)  # all-zero slice payload
    with pytest.raises(ValueError):
        tok(garbage, [(32, 1)], params, geom)


def test_pair_packers_parity_and_edges():
    """C pair-packing scans (ABI v4) vs numpy on random + edge-case rows."""
    from tiny_mp2v_dec_tpu.tokenizer.native import pair_packers
    packers = pair_packers()
    if packers is None:
        pytest.skip("native extension unavailable")
    count_pairs, pack_pairs = packers
    rng = np.random.default_rng(42)
    cases = [
        np.zeros((5, 64), np.int16),                       # all-zero rows
        np.full((3, 64), -2048, np.int16),                 # fully dense rows
        rng.integers(-2048, 2048, (257, 64)).astype(np.int16),
        np.zeros((0, 64), np.int16),                       # empty
    ]
    sparse = rng.integers(-300, 300, (1000, 64)).astype(np.int16)
    sparse[rng.random((1000, 64)) < 0.9] = 0
    cases.append(sparse)
    for rows in cases:
        k = rows.shape[0]
        nnz = np.empty(max(k, 1), np.uint8)
        n = count_pairs(np.ascontiguousarray(rows), nnz)
        assert n == int(np.count_nonzero(rows))
        if k:
            assert np.array_equal(nnz[:k], np.count_nonzero(rows, axis=1))
        pos = np.empty(max(n, 1), np.uint8)
        val = np.empty(max(n, 1), np.int16)
        m = pack_pairs(np.ascontiguousarray(rows), pos, val)
        assert m == n
        nzr, nzc = np.nonzero(rows)
        assert np.array_equal(pos[:n], nzc.astype(np.uint8))
        assert np.array_equal(val[:n], rows[nzr, nzc])


def test_row_nnz_matches_counting_scan():
    """row_nnz produced during the parse must equal a counting scan of the
    emitted coefficient rows (the chunk transport builds the device pair
    stream from it)."""
    rng = np.random.default_rng(4242)
    for pct in (H.PCT_I, H.PCT_P, H.PCT_B):
        pics = [random_picture(rng, 6, 4, H.CHROMA_420, H.PCT_I),
                random_picture(rng, 6, 4, H.CHROMA_420, pct)]
        data = encode_stream(96, 64, H.CHROMA_420, pics)
        for tok in _native_tokens(data):
            k = tok.n_coded_blocks
            assert tok.row_nnz is not None and k > 0
            np.testing.assert_array_equal(
                tok.row_nnz[:k],
                np.count_nonzero(tok.cblk[:k], axis=1).astype(np.uint8))
