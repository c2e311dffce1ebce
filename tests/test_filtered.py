"""Metadata-filtered search (Lucene filter-query semantics) and total
hit counts: index-served path vs recompute twin, plus the semantic
pins — full-corpus weights with the filter applied only at emit, and a
brute-force hit-count check against the tokenizer."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fidx(spark, tiny_corpus, tmp_path_factory):
    from engine.index import build_index

    d = str(tmp_path_factory.mktemp("filtered_idx"))
    return build_index(spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=1)


def _some_repo(tiny_corpus):
    return tiny_corpus.agg(F.min("repo")).collect()[0][0]


def test_filtered_indexed_equals_recompute(spark, tiny_corpus, fidx):
    from engine.query import bm25_topk_filtered

    repo = _some_repo(tiny_corpus)
    q = "index search engine"
    want = bm25_topk_filtered(
        spark, tiny_corpus, q, 10,
        predicate=F.col("repo") == repo, use_stem=False, round_scores=6,
    ).collect()
    got = fidx.filtered_topk(q, 10, repo=repo, round_scores=6).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == [
        (r["rank"], r["doc_id"], r["score"]) for r in want
    ]
    assert len(got) > 0


def test_filter_restricts_but_does_not_rescore(spark, tiny_corpus, fidx):
    """Lucene pin: every filtered hit's score equals its score in the
    UNFILTERED exhaustive scoring (weights stay full-corpus), and every
    returned doc satisfies the predicate."""
    repo = _some_repo(tiny_corpus)
    q = "index search engine"
    full = {
        r["doc_id"]: r["score"]
        for r in fidx.bm25_scores_all(q).collect()
    }
    member = {
        r["doc_id"]
        for r in tiny_corpus.where(F.col("repo") == repo)
        .select("doc_id").collect()
    }
    for r in fidx.filtered_topk(q, 10, repo=repo).collect():
        assert r["doc_id"] in member
        assert r["score"] == pytest.approx(full[r["doc_id"]], abs=1e-9)


def test_path_prefix_filter(spark, tiny_corpus, fidx):
    """path_prefix narrows to a point doc; that doc must surface iff it
    matches a query term."""
    row = (
        fidx.doc_stats().orderBy("doc_id").select("doc_id", "path").limit(1).collect()[0]
    )
    got = fidx.filtered_topk("index search engine", 10, path_prefix=row["path"]).collect()
    assert {r["doc_id"] for r in got} <= {row["doc_id"]}


def test_hit_counts_indexed_equals_recompute_and_bruteforce(spark, tiny_corpus, fidx):
    from engine.tokenizer import tokenize

    queries = {"qa": "index search engine", "qb": "query join window group"}
    got = {
        r["query_id"]: r["n_hits"]
        for r in fidx.hit_counts(queries).collect()
    }
    # brute force over the tokenizer itself
    rows = tiny_corpus.select("doc_id", "content").collect()
    want = {}
    for qid, text in queries.items():
        terms = set(tokenize(text, use_stem=False))
        want[qid] = sum(
            1 for r in rows if terms & set(tokenize(r["content"], use_stem=False))
        )
    assert got == want


def test_hit_counts_empty_queries(spark, fidx):
    assert fidx.hit_counts({}).count() == 0


def test_filtered_plan_pushes_both_predicates(spark, fidx):
    """Plan audit: the query's term-isin reaches the postings scan AND
    the repo equality reaches the doc_stats scan (broadcast filter
    side, TakeOrderedAndProject global cut)."""
    import contextlib
    import io

    df = fidx.filtered_topk("index search engine", 10, repo="r0")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "In(term, " in plan
    assert "EqualTo(repo,r0)" in plan
    assert "TakeOrderedAndProject" in plan


def test_paged_is_disjoint_continuation(spark, fidx):
    """Pagination contract: page 2 ranks are absolute (k+1 … 2k), and
    page1 ∪ page2 equals the top-2k with no overlap."""
    q = "index search engine"
    top20 = fidx.bm25_topk(q, 20, round_scores=6).collect()
    p1 = fidx.bm25_topk_paged(q, 10, 0, round_scores=6).collect()
    p2 = fidx.bm25_topk_paged(q, 10, offset=10, round_scores=6).collect()
    assert [r["rank"] for r in p2] == list(range(11, 21))
    got = [(r["rank"], r["doc_id"], r["score"]) for r in p1 + p2]
    want = [(r["rank"], r["doc_id"], r["score"]) for r in top20]
    assert got == want


def test_filtered_prune_rank_safe_across_repos(spark, tiny_corpus, fidx):
    """Round-4: filter-aware block-max pruning (keep-mask in the
    kernel) must be rank-identical to the exhaustive filtered pass for
    EVERY repo filter — θ is maintained over filtered docs only."""
    repos = sorted(
        r["repo"] for r in tiny_corpus.select("repo").distinct().collect()
    )
    q = "index search engine"
    for repo in repos:
        a = fidx.filtered_topk(q, 10, repo=repo, round_scores=6).collect()
        b = fidx.filtered_topk(
            q, 10, repo=repo, round_scores=6, prune=False
        ).collect()
        assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == [
            (r["rank"], r["doc_id"], r["score"]) for r in b
        ], repo
