"""Codec round-trip property tests (SURVEY.md §5.2.1) via hypothesis."""

import numpy as np
from hypothesis import given, settings, strategies as st

from engine.codec import delta_decode, delta_encode, varint_decode, varint_encode


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varint_decode(varint_encode(arr), len(vals))
    assert np.array_equal(out, arr)


@given(
    st.lists(
        st.integers(min_value=1, max_value=2**40), min_size=1, max_size=400, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    out = delta_decode(delta_encode(arr), len(arr))
    assert np.array_equal(out, arr)


def test_boundaries():
    for v in [0, 1, 127, 128, 16383, 16384, 2**62, 2**63 - 1, 65535]:
        arr = np.array([v], dtype=np.uint64)
        assert varint_decode(varint_encode(arr))[0] == v
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.int64)) == b""


def test_compression_beats_fixed_width():
    # dense sorted run: gaps ~ small → ~1 byte/id vs the reference's
    # fixed 4 bytes/id (SURVEY.md §4 'fixed-width binary encoding')
    rng = np.random.default_rng(0)
    ids = np.cumsum(rng.integers(1, 30, size=10_000))
    blob = delta_encode(ids)
    assert len(blob) < 2 * len(ids)


def test_non_monotone_rejected():
    import pytest

    with pytest.raises(ValueError):
        delta_encode(np.array([3, 3], dtype=np.int64))
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 2], dtype=np.int64))
