"""IndexReader.more_like_this (artifact-only MLT) vs the recompute
twin (engine/mlt.py): identical ranked results on the same corpus, and
the stemmed-index guard."""

import pytest

# slow lane: module-scope index build backs every test here
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def unstem_index(spark, tiny_corpus, tmp_path_factory):
    from engine.index import build_index

    d = str(tmp_path_factory.mktemp("mlt_idx"))
    return build_index(spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=1)


def test_mlt_indexed_equals_recompute(spark, tiny_corpus, unstem_index):
    from engine.mlt import more_like_this

    want = more_like_this(spark, tiny_corpus, 10, 5, round_scores=6).collect()
    got = unstem_index.more_like_this(10, 5, round_scores=6).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == [
        (r["rank"], r["doc_id"], r["score"]) for r in want
    ]
    assert len(got) == 10


def test_mlt_excludes_source_doc(spark, tiny_corpus, unstem_index):
    from pyspark.sql import functions as F

    src = tiny_corpus.agg(F.min("doc_id")).collect()[0][0]
    got = {r["doc_id"] for r in unstem_index.more_like_this(10, 5).collect()}
    assert src not in got


def test_mlt_rejects_stemmed_index(spark, tiny_corpus, tmp_path_factory):
    from engine.index import build_index

    d = str(tmp_path_factory.mktemp("mlt_stem_idx"))
    r = build_index(spark, tiny_corpus, d, use_stem=True, n_shards=4, n_chunks=1)
    with pytest.raises(ValueError, match="unstemmed"):
        r.more_like_this(10, 5)


def test_mlt_text_indexed_equals_recompute(spark, tiny_corpus, tmp_path_factory):
    """Like-text MLT: artifact path == recompute on rounded keys; empty
    and out-of-vocabulary text yield empty frames on both."""
    from engine.index import build_index
    from engine.mlt import mlt_text

    d = str(tmp_path_factory.mktemp("mlt_text_idx"))
    reader = build_index(
        spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=1
    )
    body = tiny_corpus.select("doc_id", "content")
    for text in (
        "index merge segment build",
        "compression varint posting",
        "index index index merge",  # repeated terms change seed weights
    ):
        rec = mlt_text(spark, body, text, 10, 5, round_scores=6).collect()
        idx = reader.mlt_text(text, 10, 5, round_scores=6).collect()
        assert [tuple(r) for r in rec] == [tuple(r) for r in idx], text
    assert reader.mlt_text("", 10).count() == 0
    assert reader.mlt_text("zzzq qqqz", 10).count() == 0
