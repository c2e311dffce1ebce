"""Field collapsing (engine/collapse.py): DuckDB oracle parity,
recompute ↔ index-served identity (incl. tombstones), and the
one-doc-per-group invariant on the tiny corpus."""

import duckdb
import pandas as pd
import pytest

from engine.collapse import collapse_topk, collapse_topk_sql

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


@pytest.fixture(scope="module")
def cidx(spark, tiny_corpus, tmp_path_factory):
    from engine.index import build_index

    d = str(tmp_path_factory.mktemp("collapse_idx"))
    return build_index(
        spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=1
    )


def test_collapse_matches_duckdb(spark, sf1_corpus, sf1_duck):
    for q in ["table scan fast", "the value stream a", "customer"]:
        got = collapse_topk(
            spark, sf1_corpus, q, 10, round_scores=6
        ).toPandas()
        want = sf1_duck.sql(collapse_topk_sql(q, 10)).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )
        assert got["repo"].is_unique


def test_indexed_matches_recompute(spark, tiny_corpus, cidx):
    for q in ["merge segment shard", "def return", "tensor"]:
        a = collapse_topk(spark, tiny_corpus, q, 10, round_scores=6).toPandas()
        b = cidx.collapse_topk(q, 10, round_scores=6).toPandas()
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert len(a) > 0 and a["repo"].is_unique


def test_group_champion_not_in_global_topk(spark, tiny_corpus):
    # the doc that wins a small repo's slot is usually NOT in the
    # plain top-k — the exhaustive-scoring rank-safety argument made
    # concrete: collapsed results must contain champions the global
    # cut would have pruned
    from engine.query import bm25_topk_exhaustive

    q = "merge segment shard"
    plain = bm25_topk_exhaustive(
        spark, tiny_corpus, q, 10, use_stem=False, round_scores=6
    ).toPandas()
    coll = collapse_topk(spark, tiny_corpus, q, 10, round_scores=6).toPandas()
    assert len(set(coll["doc_id"]) - set(plain["doc_id"])) > 0


def test_collapse_respects_tombstones(spark, tiny_corpus, cidx, tmp_path_factory):
    import shutil

    from engine.compact import delete_documents
    from engine.index import IndexReader

    q = "merge segment shard"
    base = cidx.collapse_topk(q, 5, round_scores=6).toPandas()
    top = int(base["doc_id"].iloc[0])
    d2 = str(tmp_path_factory.mktemp("collapse_idx_del"))
    shutil.rmtree(d2)
    shutil.copytree(cidx.dir, d2)
    delete_documents(spark, d2, spark.createDataFrame([(top,)], "doc_id long"))
    after = IndexReader(spark, d2).collapse_topk(q, 5, round_scores=6).toPandas()
    assert top not in set(after["doc_id"])
    # the deleted champion's repo falls back to its next-best live doc
    assert after["repo"].is_unique
