"""Shared benchmark stream generator: bench.py (our decoder) and
tools/bench_reference.py (reference C++ decoder) must time the SAME content.

Every picture carries a QuantMatrixExtension with all four matrices loaded —
the reference decoder null-derefs without one (reference: decoder.cpp:187-190)
and leaves unloaded matrix rows uninitialized.
"""
from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def make_bench_stream(n_pictures: int, cache_dir: str,
                      mbw: int = 120, mbh: int = 68,
                      chroma: int = 1, tag: str = "v2") -> bytes:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(
        cache_dir, f"bench_{mbw}x{mbh}_cf{chroma}_{n_pictures}_{tag}.m2v")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    import numpy as np
    from m2v_encoder import encode_stream, random_picture
    from tiny_mp2v_dec_tpu import headers as H

    def full_qmext(rng):
        def mat():
            return rng.integers(1, 256, 64).astype(np.uint8)
        return H.QuantMatrixExtension(
            load_intra_quantiser_matrix=1, intra_quantiser_matrix=mat(),
            load_non_intra_quantiser_matrix=1, non_intra_quantiser_matrix=mat(),
            load_chroma_intra_quantiser_matrix=1,
            chroma_intra_quantiser_matrix=mat(),
            load_chroma_non_intra_quantiser_matrix=1,
            chroma_non_intra_quantiser_matrix=mat())

    rng = np.random.default_rng(1729)
    pct_pattern = [H.PCT_I] + [H.PCT_P, H.PCT_B, H.PCT_B] * (
        (n_pictures - 1) // 3 + 1)
    pics = []
    for i in range(n_pictures):
        p = random_picture(rng, mbw, mbh, chroma, pct_pattern[i])
        p.temporal_reference = i
        p.qmext = full_qmext(rng)
        pics.append(p)
    data = encode_stream(mbw * 16, mbh * 16, chroma, pics)
    with open(path, "wb") as f:
        f.write(data)
    return data
