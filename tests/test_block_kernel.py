"""The vectorized whole-shard block kernel must stay byte-identical to
the straightforward per-term encoder, and the sliceable varint encoder
must agree with per-range encoding (LEB128 self-delimiting property)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.codec import varint_encode, varint_encode_with_lengths
from engine.postings import (
    BLOCK_COLUMNS,
    blocks_pdf_for_shard_arrays,
    build_blocks_for_term,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300),
    st.integers(min_value=0, max_value=299),
    st.integers(min_value=0, max_value=299),
)
@settings(max_examples=60, deadline=None)
def test_varint_slices_equal_independent_encoding(vals, i, j):
    v = np.asarray(vals, dtype=np.uint64)
    out, nb = varint_encode_with_lengths(v)
    assert int(nb.sum()) == out.size
    assert out.tobytes() == varint_encode(v)
    if v.size:
        lo, hi = sorted((i % v.size, j % v.size))
        off = np.concatenate(([0], np.cumsum(nb)))
        sliced = out[off[lo]:off[hi]].tobytes()
        assert sliced == varint_encode(v[lo:hi])


@pytest.mark.parametrize("block_docs", [3, 128])
def test_shard_kernel_byte_identical_to_per_term(block_docs):
    rng = np.random.RandomState(7)
    n_docs, vocab = 400, [f"t{i:03d}" for i in range(37)]
    rows = []
    for d in range(n_docs):
        terms = sorted(rng.choice(vocab, size=rng.randint(1, 12), replace=False))
        tfs = rng.randint(1, 70000, size=len(terms)).tolist()
        rows.append(
            {
                "doc_id": int(rng.randint(0, 2**60)),
                "terms": list(terms),
                "tfs": tfs,
                "doc_len": int(sum(tfs)),
                "shard": 5,
            }
        )
    pdf = pd.DataFrame(rows).drop_duplicates("doc_id")
    out = blocks_pdf_for_shard_arrays(pdf, 123.4, block_docs)

    lens = pdf["terms"].map(len).to_numpy()
    doc_ids = np.repeat(pdf["doc_id"].to_numpy(np.int64), lens)
    dls = np.repeat(pdf["doc_len"].to_numpy(np.int64), lens)
    terms = np.concatenate([np.asarray(t, dtype=object) for t in pdf["terms"]])
    tfs = np.concatenate([np.asarray(t, dtype=np.int64) for t in pdf["tfs"]])
    ref_rows = []
    for term in sorted(set(terms)):
        m = terms == term
        ref_rows.extend(
            build_blocks_for_term(5, term, doc_ids[m], tfs[m], dls[m], 123.4, block_docs)
        )
    ref = pd.DataFrame(ref_rows, columns=BLOCK_COLUMNS)
    assert len(ref) == len(out)
    for c in BLOCK_COLUMNS:
        assert list(ref[c]) == list(out[c]), c


def test_empty_and_zero_token_docs():
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "terms": [[], []],
            "tfs": [[], []],
            "doc_len": [0, 0],
            "shard": [0, 0],
        }
    )
    out = blocks_pdf_for_shard_arrays(pdf, 10.0, 128)
    assert len(out) == 0 and list(out.columns) == BLOCK_COLUMNS
