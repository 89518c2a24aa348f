"""Production TPU kernels (Pallas IDCT + fused MC/recon) vs golden — the
analog of the reference's ``simd_test`` (SIMD kernels byte-exact vs the
golden scalar model, reference: test/gtest/simd/idct_test.cpp:42-74,
mc_test.cpp:62-72), run on CPU via Pallas interpret mode so the exact code
path that executes on TPU is covered everywhere.

The performance half of the reference's gate (SIMD >25% faster than scalar,
mc_test.cpp:86-87) cannot run on the CPU test mesh; it lives in
tools/perf_gate.py and runs on real TPU hardware (see ci.sh).
"""
import numpy as np
import pytest

from m2v_encoder import encode_stream, random_picture
from tiny_mp2v_dec_tpu import DecoderConfig, MP2VDecoder
from tiny_mp2v_dec_tpu import headers as H
from tiny_mp2v_dec_tpu.golden.decoder import decode_stream
from tiny_mp2v_dec_tpu.golden.idct import idct_blocks
from tiny_mp2v_dec_tpu.ops.idct import idct_blocks_pallas
from tiny_mp2v_dec_tpu.ops.recon import DeviceRecon
from tiny_mp2v_dec_tpu.parallel.mesh import random_tokens
from tiny_mp2v_dec_tpu.tokenizer.types import PictureGeometry


def test_idct_pallas_interpret_bitexact():
    rng = np.random.default_rng(1729)
    coeffs = rng.integers(-2048, 2048, (700, 64)).astype(np.int16)
    coeffs[0] = 0
    coeffs[1] = 2047          # saturation stress
    coeffs[2] = -2048
    ref = idct_blocks(coeffs)
    got = np.asarray(idct_blocks_pallas(coeffs, interpret=True))
    np.testing.assert_array_equal(ref, got)


def _recon_args(rng, geom):
    import jax.numpy as jnp
    t = random_tokens(rng, geom)
    t.dct_type[:] = rng.random(geom.n_mb) < 0.3
    lh, lw = geom.luma_padded
    ch, cw = geom.chroma_padded
    mk = lambda s: jnp.asarray(rng.integers(0, 256, s).astype(np.uint8))
    r0 = (mk((lh, lw)), mk((ch, cw)), mk((ch, cw)))
    r1 = (mk((lh, lw)), mk((ch, cw)), mk((ch, cw)))
    return (jnp.asarray(t.dense_coeff()), jnp.asarray(t.dct_type),
            jnp.asarray(t.fwd), jnp.asarray(t.bwd), jnp.asarray(t.field_pred),
            jnp.asarray(t.coded), jnp.asarray(t.mv), jnp.asarray(t.mvfs),
            *r0, *r1)


@pytest.mark.parametrize("mc_impl", ["roll", "swar", "mxu"])
@pytest.mark.parametrize("cf,w,h", [
    (H.CHROMA_420, 192, 112),
    (H.CHROMA_422, 320, 128),
    (H.CHROMA_444, 192, 96),
])
def test_fused_mc_recon_interpret_parity(cf, w, h, mc_impl):
    """Fused Pallas MC kernels (both implementations) == jnp gather
    formulation, full random MV coverage (all phases, both directions,
    bidir, uncoded MBs, dct_type)."""
    rng = np.random.default_rng(42 + cf)
    geom = PictureGeometry(width=w, height=h, chroma_format=cf)
    args = _recon_args(rng, geom)
    a = DeviceRecon(geom, field_support=False, use_pallas_mc=False,
                    use_pallas_idct=False)._fn(*args)
    b = DeviceRecon(geom, field_support=False, use_pallas_mc=True,
                    use_pallas_idct=True, pallas_interpret=True,
                    mc_impl=mc_impl)._fn(*args)
    for comp, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=f"component {comp}")


@pytest.mark.parametrize("mc_impl", ["swar", "mxu"])
@pytest.mark.parametrize("cf,w,h", [
    (H.CHROMA_420, 192, 112),
    (H.CHROMA_422, 320, 128),
    (H.CHROMA_444, 192, 96),
])
def test_fused_mc_field_interpret_parity(cf, w, h, mc_impl):
    """Field-based prediction in the swar Pallas kernel (affine row-base
    gathers + parity interleave) == the XLA field gather formulation —
    field_support=True no longer drops pictures to the slow path
    (VERDICT r3 #4; reference: src/core/mb_decoder.cpp:291-339)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(77 + cf)
    geom = PictureGeometry(width=w, height=h, chroma_format=cf)
    t = random_tokens(rng, geom)
    t.dct_type[:] = rng.random(geom.n_mb) < 0.3
    t.field_pred[:] = ~t.intra & (rng.random(geom.n_mb) < 0.5)
    t.mvfs[:] = rng.integers(0, 2, t.mvfs.shape)
    lh, lw = geom.luma_padded
    ch, cw = geom.chroma_padded
    mk = lambda s: jnp.asarray(rng.integers(0, 256, s).astype(np.uint8))
    r0 = (mk((lh, lw)), mk((ch, cw)), mk((ch, cw)))
    r1 = (mk((lh, lw)), mk((ch, cw)), mk((ch, cw)))
    args = (jnp.asarray(t.dense_coeff()), jnp.asarray(t.dct_type),
            jnp.asarray(t.fwd), jnp.asarray(t.bwd),
            jnp.asarray(t.field_pred), jnp.asarray(t.coded),
            jnp.asarray(t.mv), jnp.asarray(t.mvfs), *r0, *r1)
    a = DeviceRecon(geom, field_support=True, use_pallas_mc=False,
                    use_pallas_idct=False)._fn(*args)
    b = DeviceRecon(geom, field_support=True, use_pallas_mc=True,
                    use_pallas_idct=True, pallas_interpret=True,
                    mc_impl=mc_impl)._fn(*args)
    assert b is not None and DeviceRecon(
        geom, field_support=True, use_pallas_mc=True,
        mc_impl=mc_impl).use_pallas_mc  # field no longer disables the kernel
    for comp, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=f"component {comp}")


def _ipb_stream(rng, mb_w, mb_h, cf, **opts):
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
        np.testing.assert_array_equal(a.y, b.y, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(a.u, b.u, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(a.v, b.v, err_msg=f"frame {i} V")


@pytest.mark.parametrize("gop_chunk", [0, 4])
def test_runtime_pallas_interpret_matches_golden(gop_chunk):
    """End-to-end decode with the production Pallas path forced on
    (interpret mode): per-picture and GOP-chunk scan variants."""
    rng = np.random.default_rng(5150)
    data = _ipb_stream(rng, 2, 2, H.CHROMA_420)
    gold = decode_stream(data)
    dec = MP2VDecoder(DecoderConfig(gop_chunk=gop_chunk, use_pallas=True,
                                    pallas_interpret=True))
    got = dec.decode(data)
    _assert_frames_equal(gold, got)


def test_runtime_pallas_feature_stream_matches_golden():
    """Pallas path on a stream exercising q_scale_type / intra_vlc_format /
    alternate_scan (field-motion pictures fall back to the XLA path by
    design — covered by test_runtime_matches_golden_features)."""
    rng = np.random.default_rng(5151)
    data = _ipb_stream(rng, 3, 2, H.CHROMA_420, q_scale_type=1,
                       intra_vlc_format=1, alternate_scan=1)
    gold = decode_stream(data)
    got = MP2VDecoder(DecoderConfig(use_pallas=True,
                                    pallas_interpret=True)).decode(data)
    _assert_frames_equal(gold, got)


@pytest.mark.parametrize("gop_chunk", [0, 4])
def test_runtime_pallas_field_motion_stream(gop_chunk):
    """End-to-end field-motion stream (frame_pred_frame_dct=0, field-based
    MBs) decoded on the Pallas path (interpret mode) bit-exact vs golden —
    and the stats counter proves the kernel path was taken (VERDICT r3 #4:
    field motion used to silently drop whole pictures to the XLA path)."""
    rng = np.random.default_rng(5152)
    data = _ipb_stream(rng, 3, 2, H.CHROMA_420, fpfd=False,
                       allow_field_motion=True)
    gold = decode_stream(data)
    dec = MP2VDecoder(DecoderConfig(gop_chunk=gop_chunk, use_pallas=True,
                                    pallas_interpret=True))
    got = dec.decode(data)
    _assert_frames_equal(gold, got)
    assert dec.stats["mc_xla_pics"] == 0
    assert (dec.stats["mc_pallas_field_pics"]
            + dec.stats["mc_pallas_pics"]) == 5
    assert dec.stats["mc_pallas_field_pics"] > 0


def test_runtime_pallas_field_422_altscan_stream():
    """Field motion + 4:2:2 + alternate_scan on the Pallas path."""
    rng = np.random.default_rng(5153)
    data = _ipb_stream(rng, 2, 2, H.CHROMA_422, fpfd=False,
                       allow_field_motion=True, alternate_scan=1)
    gold = decode_stream(data)
    dec = MP2VDecoder(DecoderConfig(use_pallas=True, pallas_interpret=True))
    got = dec.decode(data)
    _assert_frames_equal(gold, got)
    assert dec.stats["mc_xla_pics"] == 0
