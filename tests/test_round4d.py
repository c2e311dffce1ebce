"""Round-4d: index-served facet counts.

Pinned: IndexReader.facet_counts == engine/facets.facet_counts on the
same corpus (same DuckDB oracle — driver entry facet_counts_indexed),
tombstoned docs leave the counts, stemmed indexes refuse (facet
semantics are pinned to unstemmed vocabularies, as engine/boolean.py),
empty query → empty frame. Plan: the id→doc_stats join broadcasts the
match-set side, no Python eval outside the decode kernel.
"""

import pytest
from pyspark.sql import functions as F

from engine.facets import facet_counts
from engine.index import IndexReader, build_index
from engine.io import documents_as_corpus

pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"
Q = "query join window group"


@pytest.fixture(scope="module")
def adapter_corpus(spark):
    return (
        documents_as_corpus(spark, SF)
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .cache()
    )


@pytest.fixture(scope="module")
def idx4d(spark, adapter_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx4d"))
    build_index(spark, adapter_corpus, d, use_stem=False, n_shards=4,
                n_chunks=1)
    return IndexReader(spark, d)


def test_indexed_facets_match_recompute(spark, adapter_corpus, idx4d):
    want = [
        tuple(r)
        for r in facet_counts(adapter_corpus, Q, "repo", 20).collect()
    ]
    got = [tuple(r) for r in idx4d.facet_counts(Q, "repo", 20).collect()]
    assert got == want and len(got) > 0


def test_indexed_facets_respect_tombstones(spark, adapter_corpus, tmp_path):
    from engine.compact import delete_documents

    d = str(tmp_path / "idx_tomb")
    build_index(spark, adapter_corpus, d, use_stem=False, n_shards=2,
                n_chunks=1)
    full = {r["facet"]: r["n_docs"] for r in
            IndexReader(spark, d).facet_counts(Q, "repo", 100).collect()}
    # tombstone every doc of the largest facet: its bucket must vanish,
    # every other bucket must keep its exact count
    top = max(full, key=full.get)
    delete_documents(
        spark, d, adapter_corpus.where(F.col("repo") == top).select("doc_id")
    )
    after = {r["facet"]: r["n_docs"] for r in
             IndexReader(spark, d).facet_counts(Q, "repo", 100).collect()}
    assert top not in after
    assert after == {f: n for f, n in full.items() if f != top}


def test_indexed_facets_empty_and_stemmed_guard(
    spark, adapter_corpus, idx4d, tmp_path
):
    assert idx4d.facet_counts("", "repo").count() == 0
    assert idx4d.facet_counts("the of a", "repo").count() == 0
    sd = str(tmp_path / "stemmed")
    build_index(spark, adapter_corpus, sd, use_stem=True, n_shards=2,
                n_chunks=1)
    with pytest.raises(ValueError, match="unstemmed"):
        IndexReader(spark, sd).facet_counts(Q, "repo")


def test_indexed_facets_plan_broadcasts_id_side(spark, idx4d):
    plan = (
        idx4d.facet_counts(Q, "repo", 20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" in plan  # the decode kernel
    # the doc_stats pickup must not shuffle the artifact: broadcast join
    assert "BroadcastHashJoin" in plan
