"""BM25F fielded scoring (engine/bm25f.py): DuckDB oracle parity on
the driver documents view, the w_title=0 reduction-to-plain-BM25
identity, and field-weight sensitivity on the tiny corpus."""

import duckdb
import pandas as pd
import pytest

from engine.bm25f import bm25f_topk, bm25f_topk_sql

SF1 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf1_corpus(spark):
    from engine.io import documents_as_corpus

    return documents_as_corpus(spark, SF1).cache()


@pytest.fixture(scope="module")
def sf1_duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF1}/documents.parquet'"
    )
    return con


def test_bm25f_matches_duckdb(spark, sf1_corpus, sf1_duck):
    for q in ["table scan fast", "the value stream a", "sort sort merge"]:
        got = bm25f_topk(spark, sf1_corpus, q, 10, round_scores=6).toPandas()
        want = sf1_duck.sql(bm25f_topk_sql(q, 10)).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )
        assert len(got) == 10


def test_bm25f_body_only_reduces_to_bm25(spark, sf1_corpus):
    # with w_title=0, tf̃ = tf/B and tf̃(k1+1)/(k1+tf̃) algebraically
    # equals the plain BM25 tf(k1+1)/(tf + k1·B) — the fielded formula
    # must reduce EXACTLY (same ranks, same 6dp scores)
    from engine.query import bm25_topk_exhaustive

    q = "table scan fast"
    fielded = bm25f_topk(
        spark, sf1_corpus, q, 10, w_title=0.0, round_scores=6
    ).toPandas()
    plain = bm25_topk_exhaustive(
        spark, sf1_corpus, q, 10, use_stem=False, round_scores=6
    ).toPandas()
    pd.testing.assert_frame_equal(fielded, plain, check_dtype=False)


def test_bm25f_title_weight_lifts_title_hits(spark, tiny_corpus):
    # boosting w_title must never DROP a doc whose query term sits in
    # the title prefix below a doc where it only appears in the body
    # tail; verify weight sensitivity changes at least one rank order
    base = bm25f_topk(
        spark, tiny_corpus, "merge segment", 10_000, round_scores=6
    ).toPandas()
    heavy = bm25f_topk(
        spark, tiny_corpus, "merge segment", 10_000, w_title=10.0,
        round_scores=6,
    ).toPandas()
    assert len(base) == len(heavy) > 0
    # same match set at full depth (weights rescale, never filter)
    assert set(base["doc_id"]) == set(heavy["doc_id"])
    # and the boost actually reorders something
    assert list(base["doc_id"]) != list(heavy["doc_id"])


def test_bm25f_empty_and_unknown(spark, sf1_corpus):
    assert bm25f_topk(spark, sf1_corpus, "the a", 5).count() == 0
    assert bm25f_topk(spark, sf1_corpus, "zzzunknown", 5).count() == 0


def test_most_fields_matches_duckdb_and_tie1_identity(spark, sf1_corpus, sf1_duck):
    """most_fields == DuckDB mirror; and dismax with tie_breaker=1.0 is
    EXACTLY most_fields (max+min == sum, IEEE-commutative), pinning the
    combine-swap refactor."""
    from engine.bm25f import dismax_topk, most_fields_sql, most_fields_topk

    q = "table scan fast"
    got = [
        tuple(r) for r in most_fields_topk(spark, sf1_corpus, q, 10,
                                           round_scores=6).collect()
    ]
    want = [
        tuple(r)
        for r in sf1_duck.execute(most_fields_sql(q, 10)).fetchall()
    ]
    assert got == want and got
    tie1 = [
        tuple(r)
        for r in dismax_topk(spark, sf1_corpus, q, 10, tie_breaker=1.0,
                             round_scores=6).collect()
    ]
    assert tie1 == got
