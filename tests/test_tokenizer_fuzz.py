"""Adversarial-input robustness for both tokenizers.

A malformed stream may repeat slice vertical positions (re-coding the same
MB rows), making the number of coded blocks exceed the per-picture capacity
(n_mb * blocks_per_mb).  The native tokenizer must detect the overflow and
return an error (csrc/tokenizer.cpp sparse-row claim bounds check) — never
write out of bounds; the Python tokenizer raises.  Garbage bytes at slice
positions must produce errors, not crashes.  (The reference decoder has no
such guard — its VLC decoders return garbage on invalid codes,
mp2v_vlc_dec.hpp:69 — this build is stricter.)
"""
import numpy as np
import pytest

from m2v_encoder import encode_stream, random_picture
from tiny_mp2v_dec_tpu import headers as H
from tiny_mp2v_dec_tpu.golden.decoder import scan_start_codes
from tiny_mp2v_dec_tpu.tokenizer.python_tok import tokenize_slice
from tiny_mp2v_dec_tpu.tokenizer.types import (PictureGeometry,
                                               PictureParams, PictureTokens)


def _one_picture(rng, mb_w=3, mb_h=3, cf=H.CHROMA_420, pct=H.PCT_I):
    """Encode one picture; return (data, slices, params, geom)."""
    pic = random_picture(rng, mb_w, mb_h, cf, pct)
    data = encode_stream(mb_w * 16, mb_h * 16, cf, [pic])
    seq = sext = pcext = None
    slices = []
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
            elif ext_id == H.PICTURE_CODING_EXTENSION_ID:
                pcext = H.PictureCodingExtension.parse(r)
        elif H.SLICE_START_CODE_MIN <= code <= H.SLICE_START_CODE_MAX:
            slices.append((r_pos, code))
    geom = PictureGeometry(seq.horizontal_size_value,
                           seq.vertical_size_value, sext.chroma_format)
    params = PictureParams(
        picture_coding_type=pct, f_code=pcext.f_code,
        intra_dc_precision=pcext.intra_dc_precision,
        picture_structure=pcext.picture_structure,
        frame_pred_frame_dct=pcext.frame_pred_frame_dct,
        concealment_motion_vectors=pcext.concealment_motion_vectors,
        q_scale_type=pcext.q_scale_type,
        intra_vlc_format=pcext.intra_vlc_format,
        alternate_scan=pcext.alternate_scan,
        chroma_format=geom.chroma_format, vertical_size=geom.height,
        quant_matrices=H.build_quant_matrices(seq, None))
    return data, slices, params, geom


def _python_tokenize(data, slices, params, geom):
    tokens = PictureTokens.empty(geom)
    for bit_pos, code in slices:
        tokenize_slice(data, bit_pos, code, params, geom, tokens)
    return tokens


def test_duplicate_slices_overflow_python():
    """Every slice submitted twice: an I picture codes all blocks, so the
    sparse-row capacity must overflow and raise — never corrupt memory."""
    rng = np.random.default_rng(1)
    data, slices, params, geom = _one_picture(rng)
    with pytest.raises((IndexError, ValueError)):
        _python_tokenize(data, slices * 2, params, geom)


def test_duplicate_slices_overflow_native():
    native = pytest.importorskip("tiny_mp2v_dec_tpu.tokenizer.native")
    rng = np.random.default_rng(1)
    data, slices, params, geom = _one_picture(rng)
    tok = native.native_tokenizer(num_threads=2)
    with pytest.raises(ValueError):
        tok(data, slices * 2, params, geom)
    # sanity: the unduplicated picture still tokenizes
    t = tok(data, slices, params, geom)
    assert t.n_coded_blocks <= geom.n_mb * geom.blocks_per_mb


@pytest.mark.parametrize("seed", range(8))
def test_garbage_slice_bytes(seed):
    """Random bytes at a claimed slice position: both tokenizers must raise
    a clean error (or stop at a fake start-code boundary), never crash."""
    native = pytest.importorskip("tiny_mp2v_dec_tpu.tokenizer.native")
    rng = np.random.default_rng(100 + seed)
    data, slices, params, geom = _one_picture(rng)
    garbage = bytes(rng.integers(0, 256, len(data), dtype=np.uint8))
    # avoid accidental emulation-prevention-like zero runs ending the slice
    # early being the *only* outcome — any clean termination or error is fine
    for tokenize in (_python_tokenize,
                     native.native_tokenizer(num_threads=1)):
        try:
            tokenize(garbage, slices, params, geom)
        except (ValueError, IndexError):
            pass


def test_native_tokenizer_asan():
    """Run the fuzz scenarios against an AddressSanitizer build of the
    native tokenizer in a subprocess (LD_PRELOAD of the ASan runtime into a
    fresh python).  Catches out-of-bounds writes the in-process tests can't
    (e.g. the pre-r3 unbounded sparse-row claim)."""
    import os
    import subprocess
    import sys
    from tiny_mp2v_dec_tpu.tokenizer.build import build, libasan_path

    runtime = libasan_path()
    if runtime is None:
        pytest.skip("libasan not available")
    build(asan=True)
    script = r"""
import numpy as np, sys
sys.path[:0] = [%r, %r]
from test_tokenizer_fuzz import _one_picture, _python_tokenize
from tiny_mp2v_dec_tpu.tokenizer import native
import tiny_mp2v_dec_tpu.headers as H
tok = native.native_tokenizer(num_threads=2)
rng = np.random.default_rng(7)
data, slices, params, geom = _one_picture(rng)
t = tok(data, slices, params, geom)
try:
    tok(data, slices * 3, params, geom)
    raise SystemExit("expected overflow error")
except ValueError:
    pass
for seed in range(16):
    g = bytes(np.random.default_rng(seed).integers(0, 256, len(data), dtype=np.uint8))
    try:
        tok(g, slices, params, geom)
    except ValueError:
        pass
print("ASAN_FUZZ_OK")
"""
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    env = dict(os.environ,
               LD_PRELOAD=runtime,
               MP2V_TOKENIZER_ASAN="1",
               ASAN_OPTIONS="detect_leaks=0,abort_on_error=1")
    out = subprocess.run([sys.executable, "-c", script % (here, root)],
                         capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ASAN_FUZZ_OK" in out.stdout
