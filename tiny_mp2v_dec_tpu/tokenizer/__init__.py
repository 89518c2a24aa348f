"""Tokenizer front-end: native C++ extension when built, Python fallback.

``get_tokenizer(num_threads)`` returns a callable
``(data, slices, params, geom) -> PictureTokens`` where ``slices`` is a list
of ``(bit_pos_after_start_code, start_code)`` pairs.
"""
from __future__ import annotations

from .types import PictureGeometry, PictureParams, PictureTokens


def _python_tokenizer(data, slices, params, geom) -> PictureTokens:
    from .python_tok import tokenize_slice
    tokens = PictureTokens.empty(geom)
    for bit_pos, code in slices:
        tokenize_slice(data, bit_pos, code, params, geom, tokens)
    return tokens


def get_tokenizer(num_threads: int = 0):
    try:
        from .native import native_tokenizer
        return native_tokenizer(num_threads)
    except (ImportError, OSError):
        return _python_tokenizer
