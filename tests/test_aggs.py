"""Aggregations family (engine/aggs.py) + dis_max (engine/bm25f.py):
fixture-scale DuckDB parity (the driver-contract check runs the same
entries at sf0.01 in the slow lane), empty-query guards, approx-twin
accuracy pins, and plan audits (no Python eval, broadcast where
expected, WindowGroupLimit below the top-hits shuffle)."""

import pathlib
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"
NEW = [
    "histogram_chars",
    "extended_stats_chars",
    "filters_agg_counts",
    "range_agg_chars",
    "date_histogram_events",
    "cardinality_source",
    "percentiles_chars",
    "top_hits_by_lang",
    "significant_terms_q",
    "dismax_topk",
    "composite_page1",
    "composite_page2",
    "rare_terms_chars",
    "multi_terms_lang_source",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["events", "documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


@pytest.mark.parametrize("name", NEW)
def test_agg_entry_matches_oracle(spark, duck, name):
    import __spark_entry__ as m

    sp = _canon(m.queries()[name](spark, SF).toPandas())
    du = _canon(duck.execute(m.oracle_sql()[name]).df())
    assert list(sp.columns) == list(du.columns)
    pd.testing.assert_frame_equal(sp, du, check_dtype=False, check_exact=True)


def _meta(spark):
    from pyspark.sql import functions as F

    from engine.io import normalize_splits

    d = normalize_splits(spark.read.parquet(f"{SF}/documents.parquet"))
    return d.select(
        "doc_id", F.col("text").alias("content"), "lang", "source", "n_chars"
    )


def test_empty_query_guards(spark):
    from engine.aggs import (
        cardinality_agg,
        percentiles_agg,
        range_stats_agg,
        significant_terms,
        top_hits_agg,
    )
    from engine.bm25f import dismax_topk

    c = _meta(spark)
    from engine.aggs import extended_stats_agg, histogram_agg

    for df in [
        histogram_agg(c, "the a of", "n_chars", 200),
        extended_stats_agg(c, "", "n_chars"),
        range_stats_agg(c, "the a of", "n_chars", [0, 100]),
        cardinality_agg(c, "", "source"),
        percentiles_agg(c, "", "n_chars", [0.5]),
        top_hits_agg(c, "the", "lang"),
        significant_terms(c, ""),
        dismax_topk(spark, c, "the of a"),
    ]:
        assert df.count() == 0 and len(df.columns) >= 2

    from engine.aggs import composite_agg, multi_terms_agg, rare_terms_agg

    for df in [
        composite_agg(c, "", ["lang", "source"]),
        rare_terms_agg(c, "the a of", "source"),
        multi_terms_agg(c, "", ["lang", "source"]),
    ]:
        assert df.count() == 0 and len(df.columns) >= 2


def test_composite_pages_stitch_to_full_bucket_stream(spark):
    """Page 1 + page-2-after-page-1's-last-key must reproduce the first
    2*size buckets of the un-paginated stream, with no overlap — the
    cursor contract that makes composite THE scale path for bucket
    retrieval."""
    from engine.aggs import composite_agg

    c = _meta(spark)
    q, keys, size = "query join window group", ["lang", "source"], 7
    full = composite_agg(c, q, keys, size=10**6).toPandas()
    p1 = composite_agg(c, q, keys, size=size).toPandas()
    after = tuple(p1.iloc[-1][k] for k in keys)
    p2 = composite_agg(c, q, keys, size=size, after=after).toPandas()
    got = pd.concat([p1, p2], ignore_index=True)
    want = full.head(len(got)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert not set(map(tuple, p1[keys].values)) & set(
        map(tuple, p2[keys].values)
    )


def test_cardinality_approx_within_rsd(spark):
    from engine.aggs import cardinality_agg, cardinality_approx

    c = _meta(spark)
    q = "query join window group"
    exact = cardinality_agg(c, q, "source").collect()[0]
    approx = cardinality_approx(c, q, "source", rsd=0.05).collect()[0]
    assert approx["n_docs"] == exact["n_docs"]
    # HLL++ guarantee is probabilistic; 3×rsd is a conservative pin for
    # a fixed seedless sketch on fixed data (deterministic in practice)
    assert abs(approx["n_distinct"] - exact["n_distinct"]) <= max(
        1, 3 * 0.05 * exact["n_distinct"]
    )


def test_percentiles_approx_close_to_exact(spark):
    from engine.aggs import percentiles_agg, percentiles_approx

    c = _meta(spark)
    q = "query join window group"
    pcts = [0.25, 0.5, 0.75]
    exact = {r["pct"]: r["value"] for r in percentiles_agg(c, q, "n_chars", pcts).collect()}
    approx = {
        r["pct"]: r["value"]
        for r in percentiles_approx(c, q, "n_chars", pcts, accuracy=10000).collect()
    }
    # at accuracy=10000 and fixture-sized match sets the GK sketch is
    # exact; allow one rank-neighbor of slack anyway
    for p in pcts:
        assert abs(approx[p] - exact[p]) <= max(5.0, 0.02 * exact[p])


def test_agg_plans_stay_jvm_side(spark):
    """No Python row eval anywhere in the agg plans; the top-hits group
    join broadcasts; the per-bucket row_number cut runs as a window
    group limit below the shuffle when supported."""
    from engine.aggs import range_stats_agg, significant_terms, top_hits_agg

    c = _meta(spark)
    q = "query join window group"
    for df in [
        range_stats_agg(c, q, "n_chars", [0, 200, 400]),
        significant_terms(c, q, 10),
        top_hits_agg(c, q, "lang", 3, 5),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    th = top_hits_agg(c, q, "lang", 3, 5)
    plan = th._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_composite_cursor_pushed_to_scan(spark):
    """The after-cursor must reach the parquet scan as row-group
    filters (the flat lexicographic decomposition), not sit above the
    aggregate as a struct comparison."""
    from engine.aggs import composite_agg

    c = _meta(spark)
    df = composite_agg(
        c, "query join window group", ["lang", "source"],
        size=5, after=("en", "src15"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # toString truncates the filter list, so pin the leading disjunct
    # (enough to prove the lexicographic Or reached the scan)
    assert "Or(GreaterThan(lang,en),And(EqualTo(lang,en)" in plan.replace(
        " ", ""
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
