"""Tokenizer front-end: native C++ extension when built, Python fallback.

``get_tokenizer(num_threads)`` returns a callable
``(data, slices, params, geom) -> PictureTokens`` where ``slices`` is a list
of ``(bit_pos_after_start_code, start_code)`` pairs.
"""
from __future__ import annotations

from .types import PictureGeometry, PictureParams, PictureTokens


def _python_tokenizer(on_error: str = "raise"):
    from .python_tok import tokenize_slice

    def tokenize(data, slices, params, geom) -> PictureTokens:
        tokens = PictureTokens.empty(geom)
        for bit_pos, code in slices:
            try:
                tokenize_slice(data, bit_pos, code, params, geom, tokens)
            except ValueError:
                if on_error != "drop_slice":
                    raise
                # containment: keep the slice's parsed prefix, count the drop
                tokens.bad_slices += 1
        return tokens

    return tokenize


def get_tokenizer(num_threads: int = 0, on_error: str = "raise"):
    """``on_error``: "raise" aborts the decode on the first malformed slice;
    "drop_slice" contains the damage to the failing slice (its parsed prefix
    is kept, the count is reported via ``PictureTokens.bad_slices``) — the
    recoverable-stream mode the reference lacks (it decodes garbage
    silently, reference: src/core/mp2v_vlc_dec.hpp:69)."""
    assert on_error in ("raise", "drop_slice")
    try:
        from .native import native_tokenizer
        return native_tokenizer(num_threads, on_error)
    except (ImportError, OSError):
        return _python_tokenizer(on_error)
