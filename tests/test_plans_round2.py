"""Round-2 plan audits: the shuffle shapes the VERDICT-r1 fixes bought
must stay bought — shingling without a window shuffle, SimHash without
the ×60 bit-explode exchange, no per-posting Python loop in serving."""

import contextlib
import io
import inspect
import re


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_ops(plan: str, op: str) -> int:
    """Count physical operators by their details-section header
    '(N) <Op>' — the tree section prints each node a second time."""
    return len(re.findall(rf"^\(\d+\) {op}", plan, flags=re.M))


def test_shingles_plan_has_no_window(spark, tiny_corpus):
    """Trigram shingles come from the token array JVM-side; the only
    exchange allowed is the final distinct's aggregation shuffle (the
    old posexplode + lead()-over-window shape shuffled the full token
    stream first)."""
    from engine.dedup import shingles_df

    p = plan_of(shingles_df(tiny_corpus))
    assert "Window" not in p, p
    # distinct = partial+final HashAggregate around ONE exchange
    assert n_ops(p, "Exchange") == 1, p


def test_simhash_plan_single_exchange_no_bit_explode(spark, tiny_corpus):
    """SimHash is a per-doc pure function computed in one mapInPandas
    stage: ZERO exchanges, zero Generate stages (r2's groupBy shape had
    one exchange; r1's bit-explode had a 60× one)."""
    from engine.dedup import simhash

    p = plan_of(simhash(tiny_corpus))
    assert n_ops(p, "Exchange") == 0, p
    assert n_ops(p, "Generate") == 0, p


def test_minhash_signatures_single_exchange(spark, tiny_corpus):
    """All 16 permutation minima in one map-side-combined
    groupBy(doc_id) over the RAW shingle stream: exactly one exchange,
    no params cross-join, no distinct shuffle (min() is
    duplicate-insensitive)."""
    from engine.dedup import minhash_signatures

    p = plan_of(minhash_signatures(tiny_corpus))
    assert n_ops(p, "Exchange") == 1, p
    assert "NestedLoop" not in p and "CartesianProduct" not in p, p


def test_tfidf_serving_kernel_is_vectorized():
    """The serving-path kernel must not fall back to a per-posting
    Python loop (VERDICT r1 'What's wrong' #3): no .tolist() iteration
    in IndexReader.tfidf_topk's kernel source."""
    from engine.index import IndexReader

    src = inspect.getsource(IndexReader.tfidf_topk)
    assert "np.add.at" in src
    assert "tolist()" not in src


def test_frontend_pagerank_not_collected():
    """get_pagerank must serve from parquet by isin-filter, never
    collect the whole table into a driver dict (VERDICT r1 #6)."""
    from engine.frontend import SearchService

    src = inspect.getsource(SearchService.get_pagerank)
    assert "isin" in src
    assert "parquet" in src
