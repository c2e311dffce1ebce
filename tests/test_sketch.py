"""HLL + count-min sketches: accuracy/soundness on constructed input
plus direct DuckDB parity for the two driver entries at sf0.001."""

import pathlib
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def test_hll_estimate_accuracy(spark):
    """n=2000 distinct values at m=256 registers: the HLL estimate must
    land within the textbook ~1.04/sqrt(m) relative-error band (we
    allow 3 sigma ≈ 20%), and `used`/`exact` must be exact."""
    from engine.sketch import hll_distinct

    df = spark.range(2000).select(
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v")
    )
    row = hll_distinct(df, "v").collect()[0]
    assert row["m"] == 256 and row["exact"] == 2000
    assert 0 < row["used"] <= 256
    assert abs(row["est"] - 2000) / 2000 < 0.20


def test_hll_small_range_branch(spark):
    """n << m exercises the linear-counting branch, which is near-exact."""
    from engine.sketch import hll_distinct

    df = spark.range(30).select(F.col("id").cast("string").alias("v"))
    row = hll_distinct(df, "v").collect()[0]
    assert row["exact"] == 30
    assert abs(row["est"] - 30) / 30 < 0.10


def test_cms_overestimates_only(spark):
    """CMS guarantee: cf_est >= cf_exact for every probed term, and the
    min-over-rows estimate is within the w-width error bound."""
    from engine.sketch import cms_heavy_hitters

    rows = [(d, f"t{d % 50}", (d % 7) + 1) for d in range(400)]
    toks = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    cands = ["t0", "t1", "t49", "missing"]
    out = {r["term"]: r.asDict() for r in
           cms_heavy_hitters(toks, cands).collect()}
    assert set(out) == set(cands)
    total = sum(min(tf, 65535) for _, _, tf in rows)
    for t in cands:
        assert out[t]["cf_est"] >= out[t]["cf_exact"]
        # CMS bound: overestimate < 2 * total / width with prob 1-2^-d
        assert out[t]["cf_est"] - out[t]["cf_exact"] <= 2 * total / 64
    assert out["missing"]["cf_exact"] == 0


def test_kmv_hit_counts_accuracy(spark):
    """KMV union estimate within the ~1/sqrt(k) band on a corpus big
    enough to engage estimation mode; zero-hit queries emit 0 rows of
    estimate, not omission; sub-k queries are exact."""
    from engine.sketch import kmv_hit_counts

    rows = [(d, f"t{i}", 1) for d in range(3000) for i in (d % 3, 3 + d % 5)]
    toks = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    queries = {
        "q_wide": ["t0", "t1"],        # ~2000 docs -> estimation mode
        "q_none": ["absent"],          # 0 hits -> row with 0
        "q_all": ["t0", "t1", "t2"],   # all 3000 docs
    }
    out = {r["query_id"]: r.asDict()
           for r in kmv_hit_counts(toks, queries, k=64).collect()}
    assert set(out) == set(queries)
    assert out["q_none"]["n_hits_est"] == 0.0
    assert out["q_none"]["n_hits_exact"] == 0
    for qid in ("q_wide", "q_all"):
        ex = out[qid]["n_hits_exact"]
        assert abs(out[qid]["n_hits_est"] - ex) / ex < 0.40  # 3/sqrt(64)
    assert out["q_all"]["n_hits_exact"] == 3000


def test_kmv_merge_equals_rebuild(spark):
    """The mergeability pin: keep-k(keep-k(A) ∪ keep-k(B)) must equal
    keep-k(A ∪ B) exactly — segment sketches combine without touching
    the raw postings."""
    from engine.sketch import kmv_term_sketches, merge_kmv_sketches

    rows = [(d, f"t{d % 4}", 1) for d in range(5000)]
    toks = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    a = toks.where("doc_id < 2500")
    b = toks.where("doc_id >= 2500")
    terms = [f"t{i}" for i in range(4)]
    k = 32
    full = {(r["term"], r["h"])
            for r in kmv_term_sketches(toks, terms, k).collect()}
    merged = {(r["term"], r["h"]) for r in merge_kmv_sketches(
        kmv_term_sketches(a, terms, k),
        kmv_term_sketches(b, terms, k), k=k).collect()}
    assert merged == full and len(full) == 4 * k


def test_hll_register_merge_equals_rebuild(spark):
    """Bucket-wise max over segment registers == full-corpus registers."""
    from pyspark.sql import functions as F

    from engine.sketch import hll_registers, merge_hll_registers

    df = spark.range(4000).select(
        "id", F.concat(F.lit("v"), F.col("id").cast("string")).alias("v")
    )
    a, b = df.where("id % 2 = 0"), df.where("id % 2 = 1")
    full = {(r["bucket"], r["M"]) for r in hll_registers(df, "v").collect()}
    merged = {(r["bucket"], r["M"]) for r in merge_hll_registers(
        hll_registers(a, "v"), hll_registers(b, "v")).collect()}
    assert merged == full


@pytest.mark.slow
def test_kmv_artifact_matches_recompute(spark, tiny_corpus, tmp_path_factory):
    """The index-served KMV estimate (sketch artifact, postings
    untouched) must equal the recompute estimate on the same corpus —
    same hash, same term space, same doc set ⇒ identical sketches."""
    from engine.build import tokens_df
    from engine.index import build_index
    from engine.sketch import kmv_hit_counts

    d = str(tmp_path_factory.mktemp("kmv_idx"))
    reader = build_index(
        spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=1
    )
    queries = {"q1": "index merge segment", "q2": "spark", "q3": "zzznope"}
    got = {r["query_id"]: r["n_hits_est"]
           for r in reader.hit_counts_approx(queries).collect()}
    toks = tokens_df(tiny_corpus, use_stem=False)
    from engine.tokenizer import tokenize
    want = {r["query_id"]: r["n_hits_est"]
            for r in kmv_hit_counts(
                toks,
                {q: tokenize(t, use_stem=False) for q, t in queries.items()},
            ).collect()}
    assert got == want
    assert got["q3"] == 0.0


@pytest.mark.slow
def test_kmv_carried_through_segment_merge(spark, tmp_path_factory):
    """merge_many carries the kmv artifact (keep-k union) when every
    segment has materialized it; the merged index then serves
    hit_counts_approx with values identical to a full rebuild's —
    merged indexes have no tokens artifact, so this is the ONLY way
    they get the approximate-count header."""
    from pyspark.sql import functions as F

    from engine.index import build_index
    from engine.io import documents_as_corpus
    from engine.merge import merge_many

    corpus = documents_as_corpus(spark, SF_DIR).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    root = tmp_path_factory.mktemp("kmv_merge")
    dirs = []
    for par in (0, 1):
        d = str(root / f"seg{par}")
        r = build_index(
            spark, corpus.where(F.col("doc_id") % 2 == par), d,
            use_stem=False, n_shards=4, n_chunks=1,
        )
        r.kmv_sketches_df().count()  # materialize segment sketches
        dirs.append(d)
    merged = merge_many(spark, dirs, str(root / "merged"))
    full = build_index(
        spark, corpus, str(root / "full"),
        use_stem=False, n_shards=4, n_chunks=1,
    )
    full.kmv_sketches_df().count()
    queries = {"q1": "table scan fast", "q2": "query join window group"}
    got = {r["query_id"]: r["n_hits_est"]
           for r in merged.hit_counts_approx(queries).collect()}
    want = {r["query_id"]: r["n_hits_est"]
            for r in full.hit_counts_approx(queries).collect()}
    assert got == want and got["q1"] > 0


def test_driver_entry_parity(spark):
    """Both sketch entries vs their DuckDB oracles at sf0.001 — exact
    values (register state is integer; estimates rounded identically)."""
    from engine import driver_queries as dq

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    qs, sqls = dq.spark_queries(), dq.oracle_sqls()
    for name in ("hll_distinct_content", "cms_heavy_hitters",
                 "kmv_hit_counts"):
        got = qs[name](spark, SF_DIR).toPandas()
        want = con.sql(sqls[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        g = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns), ignore_index=True)
        w = want[sorted(want.columns)].sort_values(
            by=sorted(want.columns), ignore_index=True)
        assert len(g) == len(w), name
        for c in g.columns:
            assert g[c].tolist() == w[c].tolist(), f"{name}.{c}"
