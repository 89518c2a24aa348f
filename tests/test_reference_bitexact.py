"""Bit-exactness vs the REFERENCE BINARY — the correctness bar.

Builds the reference decoder (fxslava/tiny_mp2v_dec, the same production
sources src/CMakeLists.txt:14-23 ships, SSE2 path) with a geometry-
configurable driver (tools/refbuild/ref_driver.cpp — the upstream sample
hard-codes 1920x1088 4:2:2, tiny_mp2v_dec.cpp:48), decodes generated
feature-matrix streams with both decoders, and asserts byte-identical YUV
output in display order.

Conformance policy (which streams are comparable) — see also
tokenizer/python_tok.py's module docstring:
  * concealment_motion_vectors=1 streams are EXCLUDED: the reference parses
    two concealment vectors where Table 6-17 specifies one
    (mb_decoder.cpp:567-574), desyncing the bit cursor. Covered instead by
    test_conformance_policy.py against the spec behavior.
  * intra blocks whose first AC code starts with bit '1' are EXCLUDED: the
    reference applies B.14's dct_coefficient_first short form to intra
    blocks (mb_decoder.cpp:76-88), which ISO 13818-2 reserves for
    non-intra. The stream generator's ref_compat mode avoids emitting them
    (tests/m2v_encoder.py:_random_block).
Everything else — I/P/B, 4:2:0/4:2:2/4:4:4, field motion in frame pictures,
dct_type, alternate scan, q_scale_type, intra_vlc_format, intra_dc_precision,
skips, escapes, downloaded quant matrices — must match bit for bit.
"""
import os
import subprocess
import zlib
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "refbuild"))

from m2v_encoder import encode_stream, random_picture
from tiny_mp2v_dec_tpu import headers as H


@pytest.fixture(scope="module")
def ref_decoder():
    import build as refbuild
    if not refbuild.reference_available():
        pytest.skip("reference sources or g++ toolchain not available")
    try:
        return refbuild.build_reference_decoder()
    except RuntimeError as e:
        pytest.skip(f"reference build failed: {e}")


def _pct_seq(pattern: str):
    return [{"I": H.PCT_I, "P": H.PCT_P, "B": H.PCT_B}[c] for c in pattern]


def _full_qmext(rng):
    """QuantMatrixExtension with ALL four matrices loaded.

    The reference decoder REQUIRES one per picture: mp2v_picture_c::init()
    dereferences m_quant_matrix_extension unconditionally in its final
    shuffle loop (reference: decoder.cpp:187-190 — null-deref segfault on
    streams without the extension), and rows whose load flag is 0 are left
    uninitialized. Loading all four matrices sidesteps both."""
    def mat():
        return rng.integers(1, 256, 64).astype(np.uint8)
    return H.QuantMatrixExtension(
        load_intra_quantiser_matrix=1, intra_quantiser_matrix=mat(),
        load_non_intra_quantiser_matrix=1, non_intra_quantiser_matrix=mat(),
        load_chroma_intra_quantiser_matrix=1,
        chroma_intra_quantiser_matrix=mat(),
        load_chroma_non_intra_quantiser_matrix=1,
        chroma_non_intra_quantiser_matrix=mat())


def make_stream(seed, pattern, mbw, mbh, cf, **kw):
    seq_mats = kw.pop("seq_matrices", False)
    rng = np.random.default_rng(seed)
    pics = []
    for i, pct in enumerate(_pct_seq(pattern)):
        p = random_picture(rng, mbw, mbh, cf, pct, **kw)
        p.temporal_reference = i
        p.qmext = _full_qmext(rng)
        pics.append(p)
    mats = {}
    if seq_mats:
        mats = dict(
            seq_intra_matrix=rng.integers(1, 256, 64).astype(np.uint8),
            seq_non_intra_matrix=rng.integers(1, 256, 64).astype(np.uint8))
    return encode_stream(mbw * 16, mbh * 16, cf, pics, **mats)


def decode_with_reference(binary, data, mbw, mbh, cf, tmp_path):
    m2v = tmp_path / "in.m2v"
    yuv = tmp_path / "ref.yuv"
    m2v.write_bytes(data)
    proc = subprocess.run(
        [binary, "-v", str(m2v), "-o", str(yuv), "-w", str(mbw * 16),
         "-h", str(mbh * 16), "-c", str(cf), "-t", "2"],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    return yuv.read_bytes(), proc.stdout


def decode_with_ours(data, **cfg):
    from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder
    dec = MP2VDecoder(DecoderConfig(**cfg))
    frames = dec.decode(data)
    return b"".join(f.tobytes() for f in frames), len(frames)


CASES = [
    # (name, pattern, mbw, mbh, chroma, kwargs)
    ("i_only_420", "III", 12, 6, H.CHROMA_420, {}),
    ("ippp_420", "IPPP", 12, 6, H.CHROMA_420, {}),
    ("ibbp_420", "IPBBPBB", 10, 6, H.CHROMA_420, {}),
    ("ibbp_422", "IPBB", 10, 6, H.CHROMA_422, {}),
    ("ibbp_444", "IPBB", 8, 5, H.CHROMA_444, {}),
    ("field_motion", "IPBB", 10, 6, H.CHROMA_420,
     dict(fpfd=False, allow_field_motion=True)),
    ("dct_type", "IPP", 10, 6, H.CHROMA_420, dict(fpfd=False)),
    ("alt_scan", "IPB", 10, 6, H.CHROMA_420, dict(alternate_scan=1)),
    ("q_scale_type", "IPB", 10, 6, H.CHROMA_420, dict(q_scale_type=1)),
    ("intra_vlc", "IPB", 10, 6, H.CHROMA_420, dict(intra_vlc_format=1)),
    ("dc_precision_10", "IP", 10, 6, H.CHROMA_420,
     dict(intra_dc_precision=2)),
    ("seq_matrices", "IPB", 10, 6, H.CHROMA_420, dict(seq_matrices=True)),
    ("field_422_altscan", "IPBB", 8, 6, H.CHROMA_422,
     dict(fpfd=False, allow_field_motion=True, alternate_scan=1,
          intra_vlc_format=1)),
]


@pytest.mark.parametrize("name,pattern,mbw,mbh,cf,kw",
                         CASES, ids=[c[0] for c in CASES])
def test_bitexact_vs_reference(ref_decoder, tmp_path, name, pattern,
                               mbw, mbh, cf, kw):
    data = make_stream(zlib.crc32(name.encode()) & 0xFFFF, pattern, mbw, mbh, cf, **kw)
    ref_yuv, ref_out = decode_with_reference(
        ref_decoder, data, mbw, mbh, cf, tmp_path)
    ours, n_frames = decode_with_ours(data)
    assert n_frames == len(pattern), ref_out
    assert len(ours) == len(ref_yuv), (len(ours), len(ref_yuv), ref_out)
    if ours != ref_yuv:
        dump = os.path.join("/tmp", f"conformance_fail_{name}")
        os.makedirs(dump, exist_ok=True)
        open(os.path.join(dump, "in.m2v"), "wb").write(data)
        open(os.path.join(dump, "ref.yuv"), "wb").write(ref_yuv)
        open(os.path.join(dump, "ours.yuv"), "wb").write(ours)
        ours2, _ = decode_with_ours(data)
        note = "retry_matches_ref" if ours2 == ref_yuv else "retry_also_wrong"
        note += "_same" if ours2 == ours else "_differs"
        open(os.path.join(dump, note), "w").close()
        # locate the first mismatching frame for a useful failure message
        fsz = len(ours) // n_frames
        for i in range(n_frames):
            a = np.frombuffer(ours[i * fsz:(i + 1) * fsz], np.uint8)
            b = np.frombuffer(ref_yuv[i * fsz:(i + 1) * fsz], np.uint8)
            assert (a == b).all(), (
                f"frame {i}: {np.count_nonzero(a != b)} bytes differ, "
                f"max |d|={np.abs(a.astype(int) - b.astype(int)).max()}")


def test_bitexact_gop_chunk_vs_reference(ref_decoder, tmp_path):
    """The production gop_chunk (lax.scan) path must also match the
    reference, including a chunk boundary mid-GOP."""
    data = make_stream(99, "IPBBPBBPB", 10, 6, H.CHROMA_420)
    ref_yuv, _ = decode_with_reference(ref_decoder, data, 10, 6,
                                       H.CHROMA_420, tmp_path)
    ours, n = decode_with_ours(data, gop_chunk=4)
    assert n == 9
    assert ours == ref_yuv


def test_bitexact_natural_content_vs_reference(ref_decoder, tmp_path):
    """Real-statistics content (float DCT + quantization + motion search
    over synthesized video, tests/natural_m2v.py) decoded bit-exact by
    both decoders — validates the decode path on realistic coefficient
    density and MV fields, not just random token draws (VERDICT r3 #7;
    no third-party encoder exists in this zero-egress environment)."""
    from natural_m2v import natural_stream
    mbw, mbh, n_pics = 20, 12, 8
    data = natural_stream(seed=7, mbw=mbw, mbh=mbh, n_pics=n_pics)
    ref_yuv, ref_out = decode_with_reference(
        ref_decoder, data, mbw, mbh, H.CHROMA_420, tmp_path)
    ours, n = decode_with_ours(data)
    assert n == n_pics, ref_out
    assert ours == ref_yuv
    # and through the production gop_chunk scan path
    ours2, n2 = decode_with_ours(data, gop_chunk=4)
    assert n2 == n_pics and ours2 == ref_yuv


def test_natural_content_statistics_validate_bench_assumptions():
    """The natural-content streams quantify what the random generator only
    assumes: P/B inter pictures are sparse (a few nz per coded block,
    small MVs), I pictures dense — the regime the pair-packed upload and
    the MC window loads are sized for."""
    from natural_m2v import natural_stream
    from tiny_mp2v_dec_tpu.golden.decoder import GoldenDecoder
    data = natural_stream(seed=11, mbw=20, mbh=12, n_pics=8)
    toks = GoldenDecoder().tokenize_stream(data)
    inter = [t for t in toks if not t.intra.all()]
    assert inter
    for t in inter:
        k = max(t.n_coded_blocks, 1)
        nz_per_block = np.count_nonzero(t.cblk[:k]) / k
        assert nz_per_block < 30            # sparse residual blocks
        assert np.abs(t.mv).max() <= 64     # small real-motion MVs
