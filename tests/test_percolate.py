"""Percolator contract (engine/percolate.py): reverse search —
documents matched against registered boolean queries. Pins: recompute
(single codegen corpus scan) == indexed twin (per-shard posting-run set
algebra) == the DuckDB-mirror arithmetic recomputed in pandas; every
registration gets a counts row (0 included); tombstones mask matches;
the recompute plan has no per-row Python and the indexed scan is
term-pruned."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from engine.index import IndexReader, build_index
from engine.percolate import (
    parse_registrations,
    percolate_counts,
    percolate_counts_from_postings,
    percolate_doc,
    percolate_matches,
)

pytestmark = pytest.mark.slow  # index build

REGS = [
    ("p_and", "index search", ""),
    ("p_excl", "query", "window"),
    ("p_zero", "zzznope", ""),
    ("p_stopmix", "the def", ""),   # stopword drops out → must=[def]
    ("p_empty", "the and", ""),     # tokenizes to nothing → matches 0
    ("p_not_only", "", "query"),    # pure exclusion → matches 0
]


@pytest.fixture(scope="module")
def index_dir(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_perc"))
    build_index(spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=1)
    return d


def _counts(df):
    return {r["query_id"]: r["n_docs"] for r in df.collect()}


def test_counts_match_python_oracle(spark, tiny_corpus, tiny_docs):
    """Recompute counts vs a pure-Python evaluation of the pinned
    semantics over the raw fixture docs."""
    from engine.tokenizer import tokenize

    got = _counts(percolate_counts(spark, tiny_corpus, REGS))
    toksets = {d: set(tokenize(c, use_stem=False)) for d, c in tiny_docs.items()}
    want = {}
    for qid, m, n in parse_registrations(REGS):
        if not m:
            want[qid] = 0
            continue
        want[qid] = sum(
            1
            for ts in toksets.values()
            if all(t in ts for t in m) and not any(t in ts for t in n)
        )
    assert got == want
    assert got["p_zero"] == 0 and got["p_empty"] == 0 and got["p_not_only"] == 0
    assert got["p_and"] > 0  # fixture vocabulary guarantees matches


def test_indexed_equals_recompute(spark, tiny_corpus, index_dir):
    reader = IndexReader(spark, index_dir)
    got = _counts(
        percolate_counts_from_postings(spark, reader.postings(), REGS)
    )
    want = _counts(percolate_counts(spark, tiny_corpus, REGS))
    assert got == want


def test_matches_consistent_with_counts(spark, tiny_corpus):
    pairs = percolate_matches(spark, tiny_corpus, REGS)
    agg = {
        r["query_id"]: r["n"]
        for r in pairs.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    counts = _counts(percolate_counts(spark, tiny_corpus, REGS))
    for qid, n in counts.items():
        assert agg.get(qid, 0) == n


def test_percolate_doc_single(spark, tiny_corpus, tiny_docs):
    from engine.tokenizer import tokenize

    doc_id, content = next(iter(sorted(tiny_docs.items())))
    ts = set(tokenize(content, use_stem=False))
    want = sorted(
        qid
        for qid, m, n in parse_registrations(REGS)
        if m and all(t in ts for t in m) and not any(t in ts for t in n)
    )
    assert percolate_doc(spark, tiny_corpus, REGS, doc_id) == want


def test_tombstones_mask_matches(spark, tiny_corpus, index_dir, tmp_path_factory):
    import shutil

    from engine.compact import delete_documents

    c = str(tmp_path_factory.mktemp("idx_perc_tomb") / "idx")
    shutil.copytree(index_dir, c)
    victim = (
        percolate_matches(spark, tiny_corpus, [REGS[0]])
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]["doc_id"]
    )
    delete_documents(spark, c, spark.createDataFrame([(victim,)], "doc_id long"))
    reader = IndexReader(spark, c)
    before = _counts(percolate_counts(spark, tiny_corpus, REGS))
    after = _counts(
        percolate_counts_from_postings(
            spark, reader.postings(), REGS, tombstones=reader.tombstones_df()
        )
    )
    assert after["p_and"] == before["p_and"] - 1


def test_recompute_plan_single_scan_no_python(spark, tiny_corpus):
    df = percolate_matches(spark, tiny_corpus, REGS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "Exchange" not in p, p  # registry sweep is scan-only


def test_indexed_plan_is_term_pruned(spark, index_dir):
    reader = IndexReader(spark, index_dir)
    df = percolate_counts_from_postings(spark, reader.postings(), REGS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "In(term" in p, p
