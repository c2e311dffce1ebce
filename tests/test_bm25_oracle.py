"""M1 gate (SURVEY.md §7): Spark exhaustive BM25 vs the pure-Python
oracle — rank-identical doc_ids, scores equal within 1e-6, for every
fixture query, stemmed and unstemmed."""

import pytest

from engine.query import bm25_topk_exhaustive
from oracle.bm25_ref import OracleIndex

K = 10


def _check_rank_identity(spark, tiny_corpus, tiny_docs, queries, use_stem):
    # per-query checks are independent — pipeline the Spark jobs
    # through a thread pool (identical assertion set; same wall-clock
    # move as the driver-contract sweep)
    from concurrent.futures import ThreadPoolExecutor

    from engine.build import tokens_df

    oracle = OracleIndex(tiny_docs, use_stem=use_stem)
    toks = tokens_df(tiny_corpus, use_stem=use_stem).cache()

    def check(q):
        got = bm25_topk_exhaustive(
            spark, tiny_corpus, q["text"], K, use_stem=use_stem, tokens=toks
        ).collect()
        want = oracle.bm25_topk(q["text"], K)
        got_ids = [r["doc_id"] for r in got]
        want_ids = [d for d, _ in want]
        assert got_ids == want_ids, f"query {q['query_id']}: {got_ids} != {want_ids}"
        for r, (_, s) in zip(got, want):
            assert abs(r["score"] - s) <= 1e-6, f"query {q['query_id']} score drift"
        assert [r["rank"] for r in got] == list(range(1, len(got) + 1))

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(check, queries))
    toks.unpersist()


def test_rank_identity_core_subset(spark, tiny_corpus, tiny_docs, queries):
    """Core-lane oracle gate: 3 representative queries, unstemmed. The
    full sweep (every fixture query, both stemming configs) runs in the
    slow lane below."""
    _check_rank_identity(spark, tiny_corpus, tiny_docs, queries[:3], False)


@pytest.mark.slow
@pytest.mark.parametrize("use_stem", [True, False])
def test_rank_identity_all_queries(spark, tiny_corpus, tiny_docs, queries, use_stem):
    _check_rank_identity(spark, tiny_corpus, tiny_docs, queries, use_stem)


def test_stats_match_oracle(spark, tiny_corpus, tiny_docs):
    from engine.build import corpus_stats_df, doc_stats_df, tokens_df

    oracle = OracleIndex(tiny_docs, use_stem=True)
    toks = tokens_df(tiny_corpus, use_stem=True)
    stats = corpus_stats_df(doc_stats_df(tiny_corpus, toks)).collect()[0]
    assert stats["n_docs"] == oracle.N
    assert abs(stats["avgdl"] - oracle.avgdl) < 1e-9


def test_dictionary_matches_oracle(spark, tiny_corpus, tiny_docs):
    from engine.build import dictionary_df, tokens_df

    oracle = OracleIndex(tiny_docs, use_stem=True)
    rows = dictionary_df(tokens_df(tiny_corpus, use_stem=True)).collect()
    got = {r["term"]: (r["df"], r["cf"]) for r in rows}
    want = {t: (oracle.df[t], oracle.cf[t]) for t in oracle.df}
    assert got == want
