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


# ---------------------------------------------------------------- searchAfter
# Property: topk_shard(after=cursor) + the exact downstream cursor filter
# must equal the brute-force page (docs strictly after the cursor in
# (score DESC, doc_id ASC) order, top-k) — for random posting sets,
# random cursor depths, prune on/off, and both exact and rounded-key
# modes. Guards the OR-phase-resurrection class of bug (an evicted doc
# re-merged by a later term with a dangling partial).

def _brute_page(doc_ids, scores, s_a, d_a, k, nd=None):
    sc = np.round(scores, nd) if nd is not None else scores
    ok = (sc < s_a) | ((sc == s_a) & (doc_ids > d_a))
    ids, sc = doc_ids[ok], sc[ok]
    order = np.lexsort((ids, -sc))
    return ids[order][:k], sc[order][:k]


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_search_after_kernel_matches_brute_force(data):
    from engine.postings import score_norm
    from engine.wand import topk_shard

    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    n_docs = data.draw(st.integers(5, 60))
    n_terms = data.draw(st.integers(1, 6))
    k = data.draw(st.integers(1, 8))
    prune = data.draw(st.booleans())
    nd = data.draw(st.sampled_from([None, 6]))
    block_docs = data.draw(st.sampled_from([4, 128]))
    avgdl = 50.0

    vocab = [f"t{i}" for i in range(n_terms)]
    doc_ids = np.unique(rng.randint(0, 2**40, size=n_docs * 2))[:n_docs].astype(np.int64)
    n_docs = doc_ids.size
    dls = rng.randint(5, 200, size=n_docs).astype(np.int64)
    weights = {t: float(rng.uniform(0.1, 3.0)) for t in vocab}

    rows, exact = [], np.zeros(n_docs)
    for t in vocab:
        m = rng.rand(n_docs) < 0.6
        if not m.any():
            continue
        tfs = rng.randint(1, 30, size=int(m.sum())).astype(np.int64)
        rows.extend(
            build_blocks_for_term(0, t, doc_ids[m], tfs, dls[m], avgdl, block_docs)
        )
        exact[m] += weights[t] * score_norm(tfs, dls[m], avgdl)
    if not rows:
        return
    blocks = pd.DataFrame(rows, columns=BLOCK_COLUMNS)

    # exhaustive kernel scan = the engine's own score space (the cursor
    # is always a previously SERVED hit, so it must come from the same
    # accumulation order the kernel uses — a brute-force cursor can be
    # 1 ulp off and break exact-equality mode); brute force only sanity-
    # checks the values within float tolerance
    full_ids, full_sc = topk_shard(
        blocks, weights, avgdl, n_docs + 8, prune=False, eps=0.0
    )
    matched = exact > 0
    assert set(full_ids) == set(doc_ids[matched])
    brute = dict(zip(doc_ids[matched], exact[matched]))
    assert np.allclose(
        full_sc, [brute[i] for i in full_ids], rtol=1e-9, atol=1e-12
    )

    m_ids, m_sc = full_ids, full_sc
    key_sc = np.round(m_sc, nd) if nd is not None else m_sc
    order = np.lexsort((m_ids, -key_sc))
    rank = data.draw(st.integers(0, max(0, order.size - 1)))
    s_a = float(key_sc[order][rank])
    d_a = int(m_ids[order][rank])

    eps = 0.5 * 10.0 ** (-nd) if nd is not None else 0.0
    ids, sc = topk_shard(
        blocks, weights, avgdl, k, prune=prune, eps=eps, after=(s_a, d_a)
    )
    sc = np.round(sc, nd) if nd is not None else sc
    ok = (sc < s_a) | ((sc == s_a) & (ids > d_a))
    ids, sc = ids[ok], sc[ok]
    got_order = np.lexsort((ids, -sc))
    got_ids, got_sc = ids[got_order][:k], sc[got_order][:k]

    want_ids, want_sc = _brute_page(m_ids, m_sc, s_a, d_a, k, nd)
    assert list(got_ids) == list(want_ids)
    assert np.allclose(got_sc, want_sc, rtol=0, atol=1e-9)
