"""Device reconstruction parity: JAX path must be bit-exact vs numpy golden."""
import numpy as np
import pytest

from m2v_encoder import encode_stream, random_picture
from tiny_mp2v_dec_tpu import headers as H
from tiny_mp2v_dec_tpu.golden.decoder import GoldenDecoder, scan_start_codes
from tiny_mp2v_dec_tpu.golden.recon import reconstruct_picture, zero_planes
from tiny_mp2v_dec_tpu.ops.recon import DeviceRecon
from tiny_mp2v_dec_tpu.tokenizer.python_tok import tokenize_slice
from tiny_mp2v_dec_tpu.tokenizer.types import (
    PictureGeometry, PictureParams, PictureTokens)


def _tokens_from_stream(data, pct_index=0):
    """Tokenize each picture of a generated stream; return list of
    (tokens, params)."""
    from tiny_mp2v_dec_tpu.golden import decoder as gd
    dec = GoldenDecoder()
    out = []

    # monkey-light: reuse GoldenDecoder's parsing by re-walking start codes
    offsets = scan_start_codes(data)
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
        tokens = PictureTokens.empty(geom)
        for bit_pos, code in cur["slices"]:
            tokenize_slice(data, bit_pos, code, params, geom, tokens)
        out.append(tokens)

    for off in offsets:
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


def _random_refs(rng, geom):
    lh, lw = geom.luma_padded
    ch, cw = geom.chroma_padded
    return (rng.integers(0, 256, (lh, lw)).astype(np.uint8),
            rng.integers(0, 256, (ch, cw)).astype(np.uint8),
            rng.integers(0, 256, (ch, cw)).astype(np.uint8))


@pytest.mark.parametrize("cf", [H.CHROMA_420, H.CHROMA_422, H.CHROMA_444])
@pytest.mark.parametrize("pct", [H.PCT_I, H.PCT_P, H.PCT_B])
def test_device_recon_parity(cf, pct):
    rng = np.random.default_rng(100 * cf + pct)
    mb_w, mb_h = 4, 3
    pic = random_picture(rng, mb_w, mb_h, cf, pct)
    data = encode_stream(mb_w * 16, mb_h * 16, cf, [pic])
    tokens = _tokens_from_stream(data)[0]
    ref0 = _random_refs(rng, tokens.geom)
    ref1 = _random_refs(rng, tokens.geom)

    gold = reconstruct_picture(tokens, ref0=ref0, ref1=ref1)
    dev = DeviceRecon(tokens.geom, field_support=False)(tokens, ref0, ref1)
    for comp in range(3):
        np.testing.assert_array_equal(gold[comp], np.asarray(dev[comp]),
                                      err_msg=f"comp {comp}")


@pytest.mark.parametrize("opts", [
    dict(fpfd=False),
    dict(fpfd=False, allow_field_motion=True),
    dict(alternate_scan=1, intra_vlc_format=1, q_scale_type=1),
    dict(intra_dc_precision=3),
])
def test_device_recon_parity_features(opts):
    rng = np.random.default_rng(sum(map(ord, str(opts))))
    mb_w, mb_h = 4, 4
    pic = random_picture(rng, mb_w, mb_h, H.CHROMA_420, H.PCT_B, **opts)
    data = encode_stream(mb_w * 16, mb_h * 16, H.CHROMA_420, [pic])
    tokens = _tokens_from_stream(data)[0]
    ref0 = _random_refs(rng, tokens.geom)
    ref1 = _random_refs(rng, tokens.geom)

    gold = reconstruct_picture(tokens, ref0=ref0, ref1=ref1)
    dev = DeviceRecon(tokens.geom, field_support=True)(tokens, ref0, ref1)
    for comp in range(3):
        np.testing.assert_array_equal(gold[comp], np.asarray(dev[comp]),
                                      err_msg=f"comp {comp}")


def test_device_recon_intra_only_no_refs():
    rng = np.random.default_rng(5)
    pic = random_picture(rng, 3, 2, H.CHROMA_420, H.PCT_I)
    data = encode_stream(48, 32, H.CHROMA_420, [pic])
    tokens = _tokens_from_stream(data)[0]
    gold = reconstruct_picture(tokens)
    dev = DeviceRecon(tokens.geom, field_support=False)(tokens)
    for comp in range(3):
        np.testing.assert_array_equal(gold[comp], np.asarray(dev[comp]))
