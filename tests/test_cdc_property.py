"""Differential/property tests for the gear-CDC chunker: a pure-Python
reference model of the gear window hash must agree with the numpy
vectorized implementation character-for-character over random unicode
corpora (hypothesis), plus the reconstruction and content-locality
invariants on every generated text.  (Same two-independent-
implementations pattern as test_winnowing_property / test_dynamic_
property.)"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from eventhub_to_timescale_spark.operators.cdcchunk import (
    _gear_cut_positions,
    gear_chunk_rows,
)

W, DIV = 8, 32
_MULT, _MOD = 2654435761, 1 << 32


def _model_cuts(text: str, w: int = W, divisor: int = DIV) -> list[int]:
    """Literal per-position reference: gear value per codepoint, sum
    of the w trailing gear values shifted by their offset, mod 2^32,
    cut iff ≡ 0 mod divisor and not at the text end."""
    n = len(text)
    if n < w:
        return []
    gear = [(ord(c) * _MULT) % _MOD for c in text]
    cuts = []
    for i in range(w, n + 1):  # 1-based end position
        h = sum(gear[i - 1 - j] << j for j in range(w)) % _MOD
        if h % divisor == 0 and i < n:
            cuts.append(i)
    return cuts


# codepoints across ASCII, Latin-1, CJK and astral planes — the numpy
# path reads utf-32, the model reads ord(); they must agree everywhere
_ALPHABET = st.one_of(
    st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    st.characters(min_codepoint=0xA0, max_codepoint=0xFF),
    st.characters(min_codepoint=0x4E00, max_codepoint=0x4E2F),
    st.characters(min_codepoint=0x1F600, max_codepoint=0x1F60F),
)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_ALPHABET, min_size=0, max_size=400))
def test_vectorized_cuts_equal_reference_model(text):
    assert _gear_cut_positions(text, W, DIV) == _model_cuts(text)


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet=_ALPHABET, min_size=1, max_size=400),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=2, max_value=64),
)
def test_reconstruction_for_any_params(text, w, divisor):
    rows = gear_chunk_rows(text, w, divisor)
    assert "".join(p for _, _, _, p in rows) == text
    assert [idx for idx, _, _, _ in rows] == list(range(len(rows)))
    for _, h, ln, piece in rows:
        assert ln == len(piece)
        assert h == hashlib.md5(piece.encode("utf-8")).hexdigest()


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet=_ALPHABET, min_size=100, max_size=400),
    st.integers(min_value=0, max_value=99),
    _ALPHABET,
)
def test_substitution_locality(text, pos_pct, ch):
    """A single-character substitution can only move cut positions
    within the w-wide windows that SEE the edited character — every
    cut at distance ≥ w on either side survives exactly."""
    pos = (len(text) - 1) * pos_pct // 100
    mutated = text[:pos] + ch + text[pos + 1 :]
    a = set(_gear_cut_positions(text, W, DIV))
    b = set(_gear_cut_positions(mutated, W, DIV))
    # cuts outside [pos+1-W+1, pos+W] (1-based window reach) are
    # decided by windows that never contain the edited character
    far_a = {c for c in a if c < pos + 1 or c > pos + W}
    far_b = {c for c in b if c < pos + 1 or c > pos + W}
    assert far_a == far_b
