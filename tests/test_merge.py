"""Segment-merge contract (north-star "distributed segment-merge"):
merge(build(A), build(B)) must equal build(A ∪ B) — posting blocks
byte-identical, dictionary/stats value-equal, and queries over the
merged index rank-identical to the full build."""

import pytest
from pyspark.sql import functions as F

from engine.index import IndexReader, build_index
from engine.merge import merge_indexes

# slow lane: multi-index builds + byte-identity merge contracts — core lane is `pytest -m "not slow"`
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def split_dirs(spark, tiny_corpus, tmp_path_factory):
    half_a = tiny_corpus.where(F.col("doc_id") % 2 == 0).cache()
    half_b = tiny_corpus.where(F.col("doc_id") % 2 == 1).cache()
    da = str(tmp_path_factory.mktemp("idx_a"))
    db = str(tmp_path_factory.mktemp("idx_b"))
    dfull = str(tmp_path_factory.mktemp("idx_full"))
    dm = str(tmp_path_factory.mktemp("idx_merged"))
    kw = dict(use_stem=True, n_shards=4, n_chunks=2, with_positions=True)
    build_index(spark, half_a, da, **kw)
    build_index(spark, half_b, db, **kw)
    build_index(spark, tiny_corpus, dfull, **kw)
    merge_indexes(spark, da, db, dm)
    return dfull, dm, da, db


def _blocks_set(r: IndexReader):
    return {
        (row["shard"], row["term"], row["block_id"], row["n"],
         bytes(row["doc_ids_blob"]), bytes(row["tfs_blob"]),
         bytes(row["doc_lens_blob"]))
        for row in r.postings().collect()
    }


def test_merged_blocks_byte_identical(spark, split_dirs):
    dfull, dm = split_dirs[:2]
    full, merged = IndexReader(spark, dfull), IndexReader(spark, dm)
    assert _blocks_set(full) == _blocks_set(merged)
    assert full.manifest["stats"]["n_docs"] == merged.manifest["stats"]["n_docs"]
    assert full.manifest["stats"]["avgdl"] == merged.manifest["stats"]["avgdl"]


def test_merged_dictionary_and_norms(spark, split_dirs):
    dfull, dm = split_dirs[:2]
    full, merged = IndexReader(spark, dfull), IndexReader(spark, dm)
    fd = {r["term"]: (r["df"], r["cf"], r["n_blocks"])
          for r in full.dictionary().collect()}
    md = {r["term"]: (r["df"], r["cf"], r["n_blocks"])
          for r in merged.dictionary().collect()}
    assert fd == md
    fn = {r["doc_id"]: round(r["dnorm"], 9) for r in full.doc_norms().collect()}
    mn = {r["doc_id"]: round(r["dnorm"], 9) for r in merged.doc_norms().collect()}
    assert set(fn) == set(mn)
    for d in fn:
        assert abs(fn[d] - mn[d]) <= 1e-9


def test_merged_queries_rank_identical(spark, split_dirs, queries):
    dfull, dm = split_dirs[:2]
    full, merged = IndexReader(spark, dfull), IndexReader(spark, dm)
    for q in queries[:6]:
        want = [(r["rank"], r["doc_id"]) for r in full.bm25_topk(q["text"], 10).collect()]
        got = [(r["rank"], r["doc_id"]) for r in merged.bm25_topk(q["text"], 10).collect()]
        assert got == want, q["text"]
    t_want = [tuple(r) for r in full.title_topk(queries[0]["text"], 20).collect()]
    t_got = [tuple(r) for r in merged.title_topk(queries[0]["text"], 20).collect()]
    assert t_got == t_want
    # anchor table is rank-derived, so the merge RECOMPUTES it — must
    # still equal the full build's
    a_want = [tuple(r) for r in full.anchor_topk(queries[0]["text"], 20).collect()]
    a_got = [tuple(r) for r in merged.anchor_topk(queries[0]["text"], 20).collect()]
    assert a_got == a_want


def test_merge_rejects_overlapping_docs(spark, tiny_corpus, tmp_path_factory):
    d1 = str(tmp_path_factory.mktemp("idx_o1"))
    d2 = str(tmp_path_factory.mktemp("idx_o2"))
    dm = str(tmp_path_factory.mktemp("idx_om"))
    sub = tiny_corpus.orderBy("doc_id").limit(50).cache()
    kw = dict(use_stem=True, n_shards=4, n_chunks=1)
    build_index(spark, sub, d1, **kw)
    build_index(spark, sub, d2, **kw)  # same docs on both sides
    with pytest.raises(AssertionError, match="disjoint"):
        merge_indexes(spark, d1, d2, dm)


def test_merge_norms_join_fallback(spark, split_dirs, tmp_path_factory,
                                   monkeypatch):
    """With the broadcast threshold forced to 0, the merge's doc_norms
    stage must take the decode→join→groupBy fallback (no driver-side
    dictionary collect) and produce the SAME norms as the broadcast
    path / full build (VERDICT r2 #5)."""
    import engine

    dfull, dm, da, db = split_dirs
    monkeypatch.setattr(engine, "BROADCAST_DICT_MAX_TERMS", 0)
    dm2 = str(tmp_path_factory.mktemp("idx_merged_fb"))
    merge_indexes(spark, da, db, dm2)
    full = IndexReader(spark, dfull)
    merged = IndexReader(spark, dm2)
    fn = {r["doc_id"]: r["dnorm"] for r in full.doc_norms().collect()}
    mn = {r["doc_id"]: r["dnorm"] for r in merged.doc_norms().collect()}
    assert set(fn) == set(mn)
    for d in fn:
        assert abs(fn[d] - mn[d]) <= 1e-9


def test_merged_positions_byte_identical_and_phrase_serves(spark, split_dirs):
    """The optional stage-7 positions artifact obeys the same contract:
    merge(build(A), build(B)) blocks are byte-identical to the full
    build's, and index-backed phrase search over the merged index is
    identical to the full index's."""
    dfull, dm = split_dirs[:2]
    full, merged = IndexReader(spark, dfull), IndexReader(spark, dm)

    def pos_set(r):
        return {
            (row["shard"], row["term"], row["block_id"], row["n_docs"],
             row["first_doc_id"], row["last_doc_id"],
             bytes(row["doc_ids_blob"]), bytes(row["counts_blob"]),
             bytes(row["pos_blob"]))
            for row in r.positions().collect()
        }

    assert pos_set(full) == pos_set(merged)
    f = [tuple(r) for r in full.phrase_topk("inverted index", 10).collect()]
    m = [tuple(r) for r in merged.phrase_topk("inverted index", 10).collect()]
    assert f == m


def test_add_documents_equals_full_rebuild(spark, tmp_path_factory):
    """Incremental ingestion (engine/merge.add_documents): base index +
    delta docs == full rebuild over the union, posting blocks
    byte-identical, and BM25 serving from the incremented index matches
    the recompute oracle."""
    from engine.io import documents_as_corpus
    from engine.merge import add_documents
    from pyspark.sql import functions as F

    corpus = documents_as_corpus(spark, "/root/testdata/sf0.01").withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    old = corpus.where(F.col("doc_id") % 3 != 0)
    new = corpus.where(F.col("doc_id") % 3 == 0)
    root = tmp_path_factory.mktemp("incr")
    from engine.index import build_index

    build_index(spark, old, str(root / "base"), use_stem=False,
                n_shards=4, n_chunks=1)
    r_inc = add_documents(spark, str(root / "base"), new, str(root / "inc"))
    r_full = build_index(spark, corpus, str(root / "full"), use_stem=False,
                         n_shards=4, n_chunks=1)

    cols = ["shard", "term", "block_id", "doc_ids_blob", "tfs_blob",
            "doc_lens_blob"]
    a = r_inc.postings().select(cols).toPandas().sort_values(
        ["shard", "term", "block_id"], ignore_index=True)
    b = r_full.postings().select(cols).toPandas().sort_values(
        ["shard", "term", "block_id"], ignore_index=True)
    assert len(a) == len(b) > 0
    for c in cols:
        av, bv = a[c].tolist(), b[c].tolist()
        assert all(
            bytes(x) == bytes(y) if isinstance(x, (bytes, bytearray)) else x == y
            for x, y in zip(av, bv)
        ), c

    got = [tuple(x) for x in
           r_inc.bm25_topk("table scan fast", 10, prune=True).collect()]
    want = [tuple(x) for x in
            r_full.bm25_topk("table scan fast", 10, prune=True).collect()]
    assert got == want and len(got) > 0


def test_merge_many_3way_equals_full_rebuild(spark, tmp_path_factory):
    """ONE K-way pass over three doc_id-residue segments (built with
    positions + docstore) == full union rebuild: posting AND position
    blocks byte-identical, docstore carried, snippets artifact-served
    from the merged index match the recompute path."""
    from engine.io import documents_as_corpus
    from engine.merge import merge_many
    from engine.phrase import snippet_topk
    from pyspark.sql import functions as F

    corpus = documents_as_corpus(spark, "/root/testdata/sf0.01").withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    root = tmp_path_factory.mktemp("kway")
    dirs = []
    for par in (0, 1, 2):
        d = str(root / f"seg{par}")
        build_index(spark, corpus.where(F.col("doc_id") % 3 == par), d,
                    use_stem=False, n_shards=4, n_chunks=1,
                    with_positions=True, with_docstore=True)
        dirs.append(d)
    merged = merge_many(spark, dirs, str(root / "merged"))
    full = build_index(spark, corpus, str(root / "full"), use_stem=False,
                       n_shards=4, n_chunks=1,
                       with_positions=True, with_docstore=True)

    def blobs(reader, table, cols, keys):
        pdf = getattr(reader, table)().select(keys + cols).toPandas()
        pdf = pdf.sort_values(keys, ignore_index=True)
        return [tuple(bytes(x) for x in row) for row in pdf[cols].itertuples(index=False)]

    keys = ["shard", "term", "block_id"]
    assert blobs(merged, "postings", ["doc_ids_blob", "tfs_blob"], keys) == \
           blobs(full, "postings", ["doc_ids_blob", "tfs_blob"], keys)
    assert blobs(merged, "positions", ["doc_ids_blob", "pos_blob"], keys) == \
           blobs(full, "positions", ["doc_ids_blob", "pos_blob"], keys)
    assert merged.manifest["stages"].get("docstore") == "done"
    assert merged.docstore().count() == full.docstore().count() > 0

    docs = corpus.select("doc_id", "content")
    a = snippet_topk(spark, docs, "table scan fast", 10).toPandas()
    b = merged.snippet_topk("table scan fast", 10).toPandas()
    assert a.equals(b)
