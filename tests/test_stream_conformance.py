"""Generated streams must be conformant: every MC window fully in-frame.

The reference decoder performs no bounds clamping on MC reads (reference:
src/core/mc_sse2.hpp loads directly from plane+offset), so conformant
streams are a precondition for bit-exact comparison against it — and real
encoders never emit out-of-frame predictions.
"""
import numpy as np
import pytest

from m2v_encoder import encode_stream, random_picture
from tiny_mp2v_dec_tpu import headers as H
from tiny_mp2v_dec_tpu.tokenizer import get_tokenizer
from tiny_mp2v_dec_tpu.golden.decoder import GoldenDecoder


def _check_windows(tokens, geom):
    n = geom.n_mb
    mb_y, mb_x = np.divmod(np.arange(n), geom.mb_width)
    pos_y, pos_x = mb_y * 16, mb_x * 16
    W, Hh = geom.mb_width * 16, geom.mb_height * 16
    mv = tokens.mv.astype(np.int32)  # (n, 2, 2, 2) [r, s, xy]
    used = np.zeros((n, 2, 2), bool)
    frame = ~tokens.field_pred.astype(bool)
    used[:, 0, 0] = tokens.fwd.astype(bool)
    used[:, 0, 1] = tokens.bwd.astype(bool)
    used[:, 1, 0] = tokens.fwd.astype(bool) & ~frame
    used[:, 1, 1] = tokens.bwd.astype(bool) & ~frame
    for r in range(2):
        for s in range(2):
            m = used[:, r, s]
            if not m.any():
                continue
            mvx, mvy = mv[m, r, s, 0], mv[m, r, s, 1]
            px, py = pos_x[m], pos_y[m]
            fr = frame[m]
            assert (mvx >= -2 * px).all() and (mvx <= 2 * (W - 16 - px)).all()
            # frame motion: 16-row window in frame coords
            bad_y = fr & ((mvy < -2 * py) | (mvy > 2 * (Hh - 16 - py)))
            assert not bad_y.any()
            # field motion: 8-row window in field coords
            pyf = py[~fr] // 2
            Hf = Hh // 2
            bad_f = (mvy[~fr] < -2 * pyf) | (mvy[~fr] > 2 * (Hf - 8 - pyf))
            assert not bad_f.any()


@pytest.mark.parametrize("pct_pattern,cf,fpfd,field", [
    ([H.PCT_I, H.PCT_P, H.PCT_B, H.PCT_B, H.PCT_P], H.CHROMA_420, True, False),
    ([H.PCT_I, H.PCT_P, H.PCT_B], H.CHROMA_422, False, True),
])
def test_generated_mvs_in_frame(pct_pattern, cf, fpfd, field):
    rng = np.random.default_rng(42)
    mbw, mbh = 10, 6
    pics = []
    for i, pct in enumerate(pct_pattern):
        p = random_picture(rng, mbw, mbh, cf, pct, fpfd=fpfd,
                           allow_field_motion=field)
        p.temporal_reference = i
        pics.append(p)
    data = encode_stream(mbw * 16, mbh * 16, cf, pics)
    dec = GoldenDecoder()
    toks = dec.tokenize_stream(data)
    assert len(toks) == len(pct_pattern)
    for tokens in toks:
        _check_windows(tokens, tokens.geom)
