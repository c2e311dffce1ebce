"""Round-3b operators: wildcard/prefix search, PMI related terms,
more-like-this, facet counts — cross-engine vs DuckDB at sf0.01 plus
plan/edge checks."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

# slow lane: index-build-backed wildcard/MLT parity — core lane is `pytest -m "not slow"`
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.col("text").alias("content")
    )


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


@pytest.fixture(scope="module")
def sf001_index(spark, tmp_path_factory):
    from engine.index import build_index
    from engine.io import documents_as_corpus

    corpus = documents_as_corpus(spark, SF).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    out = str(tmp_path_factory.mktemp("idx3b") / "index")
    return build_index(
        spark, corpus, out, use_stem=False, n_shards=4, n_chunks=1
    )


def test_wildcard_recompute_matches_duckdb(spark):
    from engine.driver_queries import wildcard_sql
    from engine.wildcard import wildcard_topk

    g = [
        (r["rank"], r["doc_id"], r["score"])
        for r in wildcard_topk(
            spark, _docs(spark), "s", 10, 4, round_scores=6
        ).collect()
    ]
    w = [
        (int(a), int(b), float(c))
        for a, b, c in _con().execute(wildcard_sql("s", 10, 4)).fetchall()
    ]
    assert len(g) == 10 and g == w


def test_wildcard_indexed_matches_recompute(spark, sf001_index):
    from engine.wildcard import wildcard_topk

    rec = wildcard_topk(
        spark, _docs(spark), "s", 10, 4, round_scores=6
    ).collect()
    idx = sf001_index.wildcard_topk("s", 10, 4, round_scores=6).collect()
    assert [tuple(r) for r in rec] == [tuple(r) for r in idx]


def test_wildcard_expansion_cap_and_order(spark):
    from engine.build import dictionary_df, tokens_df
    from engine.wildcard import prefix_expansions

    dic = dictionary_df(tokens_df(_docs(spark), use_stem=False))
    exp = prefix_expansions(dic, "s*", 4).collect()
    assert len(exp) == 4
    # (df DESC, term ASC) pinned order
    keys = [(-r["df"], r["term"]) for r in exp]
    assert keys == sorted(keys)
    full = {r["term"] for r in prefix_expansions(dic, "s", 50).collect()}
    assert len(full) == 6 and {r["term"] for r in exp} <= full


def test_wildcard_edge_cases(spark, sf001_index):
    from engine.wildcard import wildcard_topk

    assert wildcard_topk(spark, _docs(spark), "", 10).count() == 0
    assert wildcard_topk(spark, _docs(spark), "zzz", 10).count() == 0
    assert sf001_index.wildcard_topk("zzz", 10).count() == 0


def test_related_terms_matches_duckdb(spark):
    from engine.driver_queries import related_terms_sql
    from engine.mlt import related_terms

    g = [
        (r["rank"], r["term"], r["n_tu"], r["pmi"])
        for r in related_terms(
            spark, _docs(spark), "join", 10, 2, round_scores=6
        ).collect()
    ]
    w = [
        (int(a), b, int(c), float(d))
        for a, b, c, d in _con().execute(related_terms_sql("join", 10, 2)).fetchall()
    ]
    assert len(g) == 10 and g == w


def test_related_terms_unknown_term_empty(spark):
    from engine.mlt import related_terms

    assert related_terms(spark, _docs(spark), "qqqq", 10).count() == 0


def test_more_like_this_matches_duckdb(spark):
    from engine.driver_queries import more_like_this_sql
    from engine.mlt import more_like_this

    g = [
        (r["rank"], r["doc_id"], r["score"])
        for r in more_like_this(
            spark, _docs(spark), 10, 5, round_scores=6
        ).collect()
    ]
    w = [
        (int(a), int(b), float(c))
        for a, b, c in _con().execute(more_like_this_sql(10, 5)).fetchall()
    ]
    assert len(g) == 10 and g == w
    # the source doc itself must be excluded
    src = _docs(spark).agg(F.min("doc_id")).collect()[0][0]
    assert src not in {d for _, d, _ in g}


def test_facet_counts_matches_duckdb(spark):
    from engine.driver_queries import facet_counts_sql
    from engine.facets import facet_counts

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.col("text").alias("content"), "lang"
    )
    g = [
        (r["rank"], r["facet"], r["n_docs"])
        for r in facet_counts(docs, "query join window group", "lang", 20).collect()
    ]
    w = [
        (int(a), b, int(c))
        for a, b, c in _con()
        .execute(facet_counts_sql("query join window group", "lang", 20))
        .fetchall()
    ]
    assert g == w and len(g) > 0
    # counts must sum to the OR-match set size
    n_match = docs.where(
        F.arrays_overlap(
            F.split(F.lower("content"), r"[^a-z0-9]+"),
            F.lit(["query", "join", "window", "group"]),
        )
        & F.col("lang").isNotNull()
    ).count()
    assert sum(c for _, _, c in g) <= n_match + 1  # tokenizer superset guard


def test_facet_plan_is_codegen_scan(spark):
    """The facet match predicate must stay JVM-side: no Python eval in
    the plan, and the only exchange feeds the tiny facet aggregate."""
    from engine.facets import facet_counts

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.col("text").alias("content"), "lang"
    )
    plan = facet_counts(docs, "query join window group", "lang", 20)._jdf\
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
