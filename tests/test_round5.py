"""Round-5 additions: index-served fielded scoring (BM25F / dis_max /
most_fields from the stage-9 title_postings artifact), index-served
search aggregations (posting-block match sets + doc_stats doc-values),
pinned-codebook PQ driver entries, the composite numeric-key cursor
pin, the kmv-k sidecar, adjacency escaping, and the sequential PII
count — each against its DuckDB oracle or a pinned invariant."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF1 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf1_duck():
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF1}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def fields_reader(spark, tmp_path_factory):
    """Unstemmed index over the sf0.001 driver corpus WITH the stage-9
    title_postings artifact (and doc-values in doc_stats)."""
    from engine.index import build_index
    from engine.io import documents_as_corpus

    corpus = documents_as_corpus(spark, SF1).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    d = tmp_path_factory.mktemp("r5index")
    return build_index(
        spark, corpus, str(d), use_stem=False, n_shards=8, n_chunks=1,
        with_fields=True,
    )


@pytest.fixture(scope="module")
def sf1_corpus(spark):
    from engine.io import documents_as_corpus

    return documents_as_corpus(spark, SF1).cache()


# ------------------------------------------------- fielded indexed twins

FIELD_QUERIES = ["table scan fast", "the value stream a", "sort sort merge"]


def test_bm25f_indexed_matches_oracle(spark, fields_reader, sf1_duck):
    from engine.bm25f import bm25f_topk_sql

    for q in FIELD_QUERIES:
        got = fields_reader.bm25f_topk(q, 10, round_scores=6).toPandas()
        want = sf1_duck.sql(bm25f_topk_sql(q, 10)).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )


def test_dismax_indexed_matches_oracle(spark, fields_reader, sf1_duck):
    from engine.bm25f import dismax_topk_sql

    for q in FIELD_QUERIES:
        got = fields_reader.dismax_topk(q, 10, round_scores=6).toPandas()
        want = sf1_duck.sql(dismax_topk_sql(q, 10)).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )


def test_most_fields_indexed_matches_oracle(spark, fields_reader, sf1_duck):
    from engine.bm25f import most_fields_sql

    got = fields_reader.most_fields_topk(
        "table scan fast", 10, round_scores=6
    ).toPandas()
    want = sf1_duck.sql(most_fields_sql("table scan fast", 10)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_fielded_requires_unstemmed(spark, fields_reader):
    # the guard lives in fielded_topk_from_index; simulate a stemmed
    # reader via a shim object rather than paying a second build
    class _Stemmed:
        use_stem = True
        spark = fields_reader.spark

    from engine.bm25f import fielded_topk_from_index

    with pytest.raises(ValueError, match="unstemmed"):
        fielded_topk_from_index(_Stemmed(), "table scan")


def test_title_postings_pruned_scan(fields_reader):
    """The fielded kernel's title_postings scan must push the term isin
    to parquet (same PushedFilters discipline as the body postings)."""
    plan = (
        fields_reader.title_postings()
        .where(F.col("term").isin(["table", "scan"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "In(term" in plan


def test_field_postings_upgrade_in_place(spark, tmp_path):
    """An existing complete index upgrades with ONLY stage 9 when
    re-invoked with with_fields=True (resume semantics like
    positions)."""
    from engine.index import build_index
    from engine.io import documents_as_corpus

    corpus = documents_as_corpus(spark, SF1).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    d = str(tmp_path / "idx")
    r1 = build_index(spark, corpus, d, use_stem=False, n_shards=4, n_chunks=1)
    assert r1.manifest["stages"].get("field_postings") is None
    r2 = build_index(
        spark, corpus, d, use_stem=False, n_shards=4, n_chunks=1,
        with_fields=True,
    )
    assert r2.manifest["stages"]["field_postings"] == "done"
    # tstats average includes zero-title docs (doc-stats convention)
    n = r2.manifest["stats"]["n_docs"]
    assert r2.manifest["tstats"]["tlen_sum"] <= 12 * n
    assert r2.avg_tlen == r2.manifest["tstats"]["tlen_sum"] / n


# ------------------------------------------------- agg indexed twins

AGG_Q = "query join window group"


def test_agg_from_index_matches_oracle(spark, fields_reader, sf1_duck):
    from engine.aggs import (
        extended_stats_from_index,
        extended_stats_sql,
        histogram_from_index,
        histogram_sql,
        range_stats_from_index,
        range_stats_sql,
        top_hits_from_index,
        top_hits_sql,
    )

    cases = [
        (
            range_stats_from_index(
                fields_reader, AGG_Q, "n_chars", [0, 200, 400, 800, 1600]
            ),
            range_stats_sql(AGG_Q, "n_chars", [0, 200, 400, 800, 1600]),
        ),
        (
            histogram_from_index(fields_reader, AGG_Q, "n_chars", 200),
            histogram_sql(AGG_Q, "n_chars", 200),
        ),
        (
            extended_stats_from_index(fields_reader, AGG_Q, "n_chars"),
            extended_stats_sql(AGG_Q, "n_chars"),
        ),
        (
            top_hits_from_index(fields_reader, AGG_Q, "lang", 3, 5),
            top_hits_sql(AGG_Q, "lang", 3, 5),
        ),
    ]
    for got_df, sql in cases:
        got = got_df.toPandas()
        want = sf1_duck.sql(sql).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )


def test_filters_adjacency_from_index(spark, fields_reader, sf1_duck):
    from engine.aggs import (
        adjacency_matrix_from_index,
        adjacency_matrix_sql,
        filters_from_index,
        filters_sql,
    )

    named = {
        "scans": "table scan",
        "joins": "query join window",
        "stop_only": "the of a",
        "misses": "zzznotaterm",
    }
    got = filters_from_index(fields_reader, named).toPandas()
    want = sf1_duck.sql(filters_sql(named)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    adj = {"scan": "table scan", "merge": "merge sort",
           "stream": "stream window"}
    got = adjacency_matrix_from_index(fields_reader, adj).toPandas()
    want = sf1_duck.sql(adjacency_matrix_sql(adj)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_match_ids_pruned_scan(fields_reader):
    """match_ids' postings scan must isin-prune to the query terms."""
    from engine.facets import match_ids_from_postings

    ids = match_ids_from_postings(
        fields_reader.postings(), ["table", "scan"]
    )
    plan = ids._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan


def test_matched_doc_values_requires_unstemmed(fields_reader):
    class _Stemmed:
        use_stem = True

    from engine.aggs import _matched

    with pytest.raises(ValueError, match="unstemmed"):
        _matched(_Stemmed(), "table scan", ["n_chars"])


# ------------------------------------------------ composite key-type pin

def test_composite_numeric_key_cross_engine(spark, sf1_duck):
    """A NUMERIC key column takes the same (lexicographic, string-cast)
    cursor order in both engines — the round-4 latent edge."""
    from engine.aggs import composite_agg, composite_sql
    from engine.io import read_documents

    docs = read_documents(spark, SF1).select(
        "doc_id", F.col("text").alias("content"), "lang", "n_chars"
    ).withColumn("kbucket", F.col("doc_id") % 12)
    sf1_duck.execute(
        "CREATE OR REPLACE VIEW documents_num AS "
        f"SELECT *, doc_id % 12 AS kbucket FROM '{SF1}/documents.parquet'"
    )
    sql = composite_sql(AGG_Q, ["kbucket"], 8, after=("10",)).replace(
        "FROM tokd t JOIN documents d", "FROM tokd t JOIN documents_num d"
    )
    got = composite_agg(docs, AGG_Q, ["kbucket"], 8, after=("10",)).toPandas()
    want = sf1_duck.sql(sql).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # lexicographic: "10" < "11" < "2" — the first buckets past "10"
    assert list(got["kbucket"][:2]) == ["11", "2"]


# ------------------------------------------------------- kmv k sidecar

def test_kmv_k_sidecar_guards_mismatched_probe(spark, tmp_path):
    from engine.index import build_index
    from engine.io import documents_as_corpus

    corpus = documents_as_corpus(spark, SF1).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    ).limit(50)
    d = str(tmp_path / "kmvidx")
    r = build_index(spark, corpus, d, use_stem=False, n_shards=2, n_chunks=1)
    r.kmv_sketches_df(k=16)
    assert r.kmv_k() == 16
    with pytest.raises(ValueError, match="k=16"):
        r.kmv_sketches_df(k=64)
    # hit_counts_approx derives k from the sidecar (no kwarg needed)
    out = r.hit_counts_approx({"q1": "table scan"}).collect()
    assert len(out) == 1


# ------------------------------------------------- adjacency escaping

def test_adjacency_quote_name_cross_engine(spark, sf1_corpus, sf1_duck):
    from engine.aggs import adjacency_matrix_agg, adjacency_matrix_sql

    named = {"o'scan": "table scan", "plain": "merge sort"}
    got = adjacency_matrix_agg(sf1_corpus, named).toPandas()
    want = sf1_duck.sql(adjacency_matrix_sql(named)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert "o'scan" in set(got["bucket"])  # raw name survives unmangled


def test_adjacency_empty_named_raises(spark, sf1_corpus):
    from engine.aggs import adjacency_matrix_agg, filters_agg

    with pytest.raises(ValueError):
        adjacency_matrix_agg(sf1_corpus, {})
    with pytest.raises(ValueError):
        filters_agg(sf1_corpus, {})


# ------------------------------------------------- sequential PII count

def test_pii_overlap_counts_redacted_spans(spark, sf1_duck):
    from engine.pii import pii_redact, pii_redact_sql

    rows = [
        (1, "mail 1.2.3.4@x.com here"),        # email that looks like an IP
        (2, "ip 10.0.0.1 and user@a.bc"),      # one of each
        (3, "call +1-555-1234 at 9.9.9.9"),    # phone then IP
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = pii_redact(df).orderBy("doc_id").toPandas()
    # overlap case: ONE span redacted, so n_pii == 1 (was 2 pre-fix)
    assert got.loc[0, "n_pii"] == 1
    assert got.loc[0, "redacted"] == "mail <EMAIL> here"
    assert got.loc[1, "n_pii"] == 2 and got.loc[2, "n_pii"] == 2
    # cross-engine parity of the sequential count on the same rows
    sf1_duck.execute(
        "CREATE OR REPLACE VIEW pii_rows AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t.replace(chr(39), chr(39) * 2)}')" for i, t in rows
        )
        + ") v(doc_id, text)"
    )
    sql = pii_redact_sql(inject=False).replace("FROM documents", "FROM pii_rows")
    want = sf1_duck.sql(sql).df().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_pii", "redacted"]], want, check_dtype=False
    )


# ------------------------------------------------- PQ pinned codebooks

def test_pinned_pq_codebooks_shape_and_determinism():
    import numpy as np

    from engine.sim import pinned_pq_codebooks

    b = pinned_pq_codebooks(64)
    assert b.shape == (16, 16, 4)
    assert np.array_equal(b, pinned_pq_codebooks(64))
    assert float(b.max()) <= 1.0 and float(b.min()) >= -1.0
    with pytest.raises(ValueError):
        pinned_pq_codebooks(63)


def test_pq_pinned_matches_duckdb(spark, sf1_duck):
    from engine.sim import (
        load_embeddings,
        pinned_pq_codebooks,
        pq_pinned_sql,
        pq_topk,
        query_vector,
    )

    qv = query_vector(spark, SF1)
    got = pq_topk(
        load_embeddings(spark, SF1), qv, 20,
        codebooks=pinned_pq_codebooks(len(qv)),
    ).toPandas()
    want = sf1_duck.sql(pq_pinned_sql(20, dim=len(qv))).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------- per-query cache discipline

def test_recompute_fielded_leaves_no_cached_frames(spark, sf1_corpus):
    """bm25f/dismax/synonym/tfidf recompute paths must unpersist their
    per-query token cache after materializing the k rows (round-4
    ADVICE: a long-lived serving process would otherwise accumulate
    executor storage)."""
    from engine.bm25f import bm25f_topk, dismax_topk
    from engine.ranking import tfidf_cosine_topk
    from engine.synonyms import synonym_topk

    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    bm25f_topk(spark, sf1_corpus, "table scan", 5, round_scores=6).collect()
    dismax_topk(spark, sf1_corpus, "table scan", 5, round_scores=6).collect()
    synonym_topk(
        spark, sf1_corpus, "table scan", {"scan": ["scan", "filter"]}, 5,
        round_scores=6,
    ).collect()
    tfidf_cosine_topk(spark, sf1_corpus, "table scan", 5).collect()
    after = sc._jsc.getPersistentRDDs().size()
    assert after <= before


# ------------------------------------------ frontend dispatch parity

def test_frontend_fielded_and_agg_dispatch(spark, fields_reader, sf1_corpus):
    """A service bound to an unstemmed fields-enabled index serves
    bm25f/dismax and the agg routes FROM THE INDEX, value-identical to
    the recompute-only service on the same corpus."""
    from engine.frontend import SearchService

    with_idx = SearchService(spark, sf1_corpus, index_dir=fields_reader.dir)
    recompute = SearchService(spark, sf1_corpus)
    assert with_idx._fields_ready() and with_idx._aggs_reader_ready("n_chars")
    assert not recompute._fields_ready()

    def _approx(a, b):
        # routes don't round scores; the two physical plans sum term
        # partials in different orders, so allow the last ulp on floats
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            assert len(ra) == len(rb)
            for x, y in zip(ra, rb):
                if isinstance(x, float) and isinstance(y, float):
                    assert x == pytest.approx(y, rel=1e-9, abs=1e-9)
                else:
                    assert x == y

    q = "table scan fast"
    _approx(with_idx.search_bm25f(q, 5), recompute.search_bm25f(q, 5))
    _approx(with_idx.search_dismax(q, 5), recompute.search_dismax(q, 5))
    _approx(with_idx.aggs_range(q), recompute.aggs_range(q))
    _approx(with_idx.aggs_percentiles(q), recompute.aggs_percentiles(q))
    assert with_idx.aggs_top_hits(q) == recompute.aggs_top_hits(q)
    # cardinality over repo (always a doc_stats column)
    assert with_idx.aggs_cardinality(q, "repo") == recompute.aggs_cardinality(
        q, "repo"
    )


def test_significant_terms_from_index_matches_oracle(
    spark, fields_reader, sf1_duck
):
    from engine.aggs import significant_terms_from_index, significant_terms_sql

    got = significant_terms_from_index(
        fields_reader, AGG_Q, 15, 2
    ).toPandas()
    want = sf1_duck.sql(significant_terms_sql(AGG_Q, 15, 2)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


# ------------------------------------------------- edge queries, new paths

def test_fielded_indexed_edge_queries(spark, fields_reader):
    """All-stopword / unknown-term / empty queries return valid empty
    (or small) frames on the index-served fielded paths — no throw."""
    for q in ["the and of", "zzzunknownterm", "", "!!! ..."]:
        for fn in (
            fields_reader.bm25f_topk,
            fields_reader.dismax_topk,
            fields_reader.most_fields_topk,
        ):
            out = fn(q, 5, round_scores=6)
            assert out.columns == ["rank", "doc_id", "score"]
            assert out.count() == 0


def test_agg_indexed_edge_queries(spark, fields_reader):
    from engine.aggs import (
        histogram_from_index,
        range_stats_from_index,
        top_hits_from_index,
    )

    for q in ["the and of", ""]:
        assert range_stats_from_index(
            fields_reader, q, "n_chars", [0, 100]
        ).count() == 0
        assert histogram_from_index(fields_reader, q, "n_chars", 100).count() == 0
        assert top_hits_from_index(fields_reader, q, "lang").count() == 0
    # unknown term: empty match set, zero-row buckets (not a throw)
    assert range_stats_from_index(
        fields_reader, "zzzunknownterm", "n_chars", [0, 100]
    ).count() == 0


def test_match_ids_unknown_and_empty(fields_reader):
    assert fields_reader.match_ids("zzzunknownterm").count() == 0
    assert fields_reader.match_ids("").count() == 0


def test_agg_twin_plan_reads_no_corpus(fields_reader):
    """The index-served agg frame must read ONLY the postings and
    doc_stats artifacts — no documents/corpus parquet anywhere in the
    physical plan (the whole point of the round-5 twins: request cost
    is posting-mass + match-set, not corpus width)."""
    m = fields_reader.matched_doc_values("table scan", ["n_chars", "lang"])
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "doc_stats" in plan and "postings" in plan
    assert "documents.parquet" not in plan and "/documents" not in plan
    # and the fielded kernel likewise: body + title blocks only
    f = fields_reader.bm25f_topk("table scan", 5)
    fplan = f._jdf.queryExecution().executedPlan().toString()
    assert "title_postings" in fplan
    assert "documents.parquet" not in fplan


# ------------------------------------------------ hybrid retrieval (RRF)

def test_rrf_hybrid_matches_oracle(spark, fields_reader, sf1_corpus, sf1_duck):
    from engine.driver_queries import rrf_hybrid_sql
    from engine.hybrid import rrf_hybrid_from_index, rrf_hybrid_topk
    from engine.sim import load_embeddings, query_vector

    emb = load_embeddings(spark, SF1)
    qv = query_vector(spark, SF1)
    q = "table scan fast"
    want = sf1_duck.sql(rrf_hybrid_sql(q, 10)).df()
    got = rrf_hybrid_topk(spark, sf1_corpus, emb, q, qv, 10).toPandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    got_i = rrf_hybrid_from_index(fields_reader, emb, q, qv, 10).toPandas()
    pd.testing.assert_frame_equal(got_i, want, check_dtype=False)


def test_rrf_union_and_bounds(spark, fields_reader, sf1_corpus):
    """RRF output ⊆ union of the two top-N lists; per-doc score is
    bounded by 2/(rrf_k+1); a doc in BOTH lists outranks one with the
    same single-list rank alone."""
    from engine.hybrid import RRF_K, rrf_hybrid_topk
    from engine.query import bm25_topk_exhaustive
    from engine.sim import cosine_topk, load_embeddings, query_vector

    emb = load_embeddings(spark, SF1)
    qv = query_vector(spark, SF1)
    q = "table scan fast"
    fused = rrf_hybrid_topk(spark, sf1_corpus, emb, q, qv, 10).collect()
    b_ids = {r["doc_id"] for r in bm25_topk_exhaustive(
        spark, sf1_corpus, q, 50, use_stem=False, round_scores=6).collect()}
    c_ids = {r["vec_id"] for r in cosine_topk(emb, qv, 50).collect()}
    assert {r["doc_id"] for r in fused} <= (b_ids | c_ids)
    assert all(0 < r["rrf"] <= 2.0 / (RRF_K + 1) + 1e-9 for r in fused)


def test_cosine_filtered_prefilter_semantics(spark, sf1_duck):
    """PRE-filter returns exactly k matching docs, and every returned
    doc passes the predicate (post-filtering a global top-k would
    return fewer)."""
    from engine.hybrid import cosine_filtered_topk
    from engine.io import read_documents
    from engine.sim import cosine_filtered_sql, load_embeddings, query_vector

    emb = load_embeddings(spark, SF1)
    qv = query_vector(spark, SF1)
    meta = read_documents(spark, SF1).select("doc_id", "lang")
    got = cosine_filtered_topk(emb, meta, qv, 20, lang="de").toPandas()
    want = sf1_duck.sql(cosine_filtered_sql(20, lang="de")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    de_ids = {r["doc_id"] for r in meta.where(F.col("lang") == "de").collect()}
    assert len(got) == 20 and set(got["vec_id"]) <= de_ids


def test_hybrid_routes(spark, fields_reader, sf1_corpus):
    """/search_hybrid and /search_knn end-to-end through the Flask app
    with an embeddings-bound, fields-enabled service."""
    flask = pytest.importorskip("flask")  # noqa: F841
    from engine.frontend import SearchService, create_app
    from engine.sim import load_embeddings, query_vector

    svc = SearchService(
        spark, sf1_corpus, index_dir=fields_reader.dir,
        embeddings=load_embeddings(spark, SF1),
    )
    app = create_app(svc)
    app.config["TESTING"] = True
    c = app.test_client()
    qv = query_vector(spark, SF1)
    r = c.post("/search_hybrid", json={"query": "table scan fast", "qvec": qv})
    assert r.status_code == 200 and len(r.get_json()) == 10
    r = c.post("/search_knn", json={"qvec": qv, "lang": "en", "k": 5})
    body = r.get_json()
    assert r.status_code == 200 and len(body) == 5
    # unbound embeddings raise a clear error
    bare = SearchService(spark, sf1_corpus)
    with pytest.raises(ValueError, match="embeddings"):
        bare.search_hybrid("x", qv)
