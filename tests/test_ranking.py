"""Property tests for engine/ranking.py (the reference frontend's
non-BM25 surfaces). Cross-engine value parity vs DuckDB is covered by
tests/test_driver_contract.py; here we pin engine-independent
semantics on the fixture corpus."""

from __future__ import annotations

import math

import pytest

from engine.ranking import (
    PR_DAMP,
    fusion_topk,
    pagerank,
    tfidf_cosine_topk,
    title_match_topk,
    title_terms_df,
)

QUERY = "inverted index compression"


def test_tfidf_cosine_in_unit_range_and_ranked(spark, tiny_corpus):
    rows = tfidf_cosine_topk(spark, tiny_corpus, QUERY, 10).collect()
    assert rows, "fixture corpus must match the fixture query"
    assert all(0.0 < r["cos"] <= 1.0 + 1e-9 for r in rows)
    scores = [(-r["cos"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_tfidf_self_similarity_tops(spark, tiny_corpus):
    """Querying with a doc's own full content ranks that doc first
    (cosine of a doc with itself is maximal among equals)."""
    row = tiny_corpus.select("doc_id", "content").orderBy("doc_id").first()
    top = tfidf_cosine_topk(spark, tiny_corpus, row["content"], 1).collect()[0]
    assert top["doc_id"] == row["doc_id"]


def test_title_match_bounded_by_query_terms(spark, tiny_corpus):
    rows = title_match_topk(spark, tiny_corpus, QUERY, 50).collect()
    n_q = 3
    assert all(1 <= r["n_hits"] <= n_q for r in rows)
    # every hit doc really has the terms in its title field
    hit_ids = [r["doc_id"] for r in rows]
    title = {
        (r["doc_id"], r["term"]) for r in title_terms_df(tiny_corpus).collect()
    }
    for r in rows[:5]:
        present = sum(
            (r["doc_id"], t) in title for t in ("inverted", "index", "compression")
        )
        assert present == r["n_hits"]
    assert len(hit_ids) == len(set(hit_ids))


def test_fusion_blends_and_empty_query(spark, tiny_corpus):
    rows = fusion_topk(spark, tiny_corpus, QUERY, 10).collect()
    assert rows and all(0.0 < r["score"] <= 1.0 + 1e-9 for r in rows)
    assert fusion_topk(spark, tiny_corpus, "the of and", 10).count() == 0


def test_pagerank_sums_to_one_and_positive(spark, tiny_corpus):
    rows = pagerank(tiny_corpus).collect()
    n = tiny_corpus.count()
    assert len(rows) == n
    total = sum(r["pr"] for r in rows)
    # fixed-iteration PR over an outdeg-2 graph conserves mass
    assert math.isclose(total, 1.0, rel_tol=0, abs_tol=1e-3)
    assert all(r["pr"] >= (1.0 - PR_DAMP) / n - 1e-9 for r in rows)


@pytest.mark.parametrize("q", ["", "the of and", "zzz_unknown_term"])
def test_edge_queries_do_not_throw(spark, tiny_corpus, q):
    assert tfidf_cosine_topk(spark, tiny_corpus, q, 5).count() == 0
    assert title_match_topk(spark, tiny_corpus, q, 5).count() == 0
    assert fusion_topk(spark, tiny_corpus, q, 5).count() == 0
