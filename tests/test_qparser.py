"""Query-string front door (engine/qparser.py): grammar units,
recompute ↔ DuckDB oracle parity on the driver documents view, and
recompute ↔ index-served rank identity (incl. tombstones) on the tiny
corpus. Autocomplete (engine/wildcard.suggest_prefix) rides along."""

import duckdb
import pandas as pd
import pytest

from engine.qparser import parse_query, query_string_sql, query_string_topk

SF1 = "/root/testdata/sf0.001"


# ------------------------------------------------------------- parser

def test_parse_clause_classification():
    p = parse_query('+table s* merg~ -dup "row scan" repo:src1')
    assert p.must == ("table",)
    assert p.must_not == ("dup",)
    assert p.prefixes == ("s",)
    assert p.fuzzies == ("merg",)
    assert p.phrases == ((("row", "scan"), False),)
    assert p.filters == (("repo", "src1"),)
    assert p.has_constraints


def test_parse_negated_phrase_and_should():
    p = parse_query('value -"row scan" lang:en path:doc/1')
    assert p.should == ("value",)
    assert p.phrases == ((("row", "scan"), True),)
    assert dict(p.filters) == {"lang": "en", "path": "doc/1"}


def test_parse_boosts():
    p = parse_query("+table fast^2 slow^0.5 merge merge^1.5")
    assert p.must == ("table",)
    assert set(p.should) == {"fast", "slow", "merge"}
    assert dict(p.boosts) == {"fast": 2.0, "slow": 0.5, "merge": 1.5}
    # repeated explicit boosts of one term take the max
    assert dict(parse_query("scan^2 scan^3").boosts) == {"scan": 3.0}


def test_parse_rejects_bad_boosts():
    for bad in ("pre*^2", "merg~^2", "repo:src1^2", "-dup^2", '"row scan"^2'):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_boost_scales_partial(spark, sf1_corpus):
    """score(term^2 alone) == 2 × score(term alone), doc for doc."""
    base = {
        r["doc_id"]: r["score"]
        for r in query_string_topk(spark, sf1_corpus, "value", 10).collect()
    }
    twice = {
        r["doc_id"]: r["score"]
        for r in query_string_topk(spark, sf1_corpus, "value^2", 10).collect()
    }
    assert set(base) == set(twice) and base
    for d, s in base.items():
        assert twice[d] == pytest.approx(2.0 * s)


def test_parse_stopword_clauses_drop_silently():
    p = parse_query('the a +the "the a"')
    assert p == parse_query("")
    assert not p.has_constraints


def test_parse_multiword_clause_and_dedup():
    p = parse_query("+table +table scan scan table")
    assert p.must == ("table",)
    # should-dedup removes terms already MUST
    assert p.should == ("scan",)


def test_parse_rejects_signed_expansions_and_filters():
    for bad in ["+pre*", "-pre*", "+merg~", "-repo:src1"]:
        with pytest.raises(ValueError):
            parse_query(bad)


# ----------------------------------- recompute ↔ DuckDB oracle (sf0.001)

PARITY_QS = [
    '+table s* merg~ -dup "row scan" repo:src1',  # everything at once
    "s* merg~",                                   # expansions only
    "row -dup",                                   # should + must_not
    '-"row scan" value',                          # negated phrase
    "lang:en value scan",                         # lang filter (recompute)
    "+scan +row lang:fr",                         # multi-must + filter
    "zzz*",                                       # empty expansion
    "+table fast^2 slow^0.5",                     # boost + deboost
    "merge merge^1.5 scan",                       # bare + boosted (explicit wins)
    'fast^2 -dup "row scan"',                     # boost beside constraints
]


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


def test_query_string_matches_duckdb(spark, sf1_corpus, sf1_duck):
    nonzero = 0
    for qs in PARITY_QS:
        got = query_string_topk(
            spark, sf1_corpus, qs, 10, round_scores=6
        ).toPandas()
        want = sf1_duck.sql(query_string_sql(qs, 10, round_scores=6)).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )
        nonzero += int(len(got) > 0)
    assert nonzero >= 4  # the parity set must actually exercise results


def test_suggest_prefix_matches_duckdb(spark, sf1_corpus, sf1_duck):
    from engine.build import dictionary_df, tokens_df
    from engine.wildcard import suggest_prefix, suggest_prefix_sql

    d = dictionary_df(tokens_df(sf1_corpus, use_stem=False))
    got = suggest_prefix(d, "s", 10).toPandas()
    want = sf1_duck.sql(suggest_prefix_sql("s", 10)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0 and list(got.columns) == ["rank", "term", "df"]


# --------------------------------- indexed twin (tiny corpus, positions)

@pytest.fixture(scope="module")
def qidx(spark, tiny_corpus, tmp_path_factory):
    from engine.index import build_index

    d = str(tmp_path_factory.mktemp("qs_idx"))
    return build_index(
        spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=1,
        with_positions=True,
    )


TINY_QS = [
    '+merge seg* "def return" -rollback',
    'block str* encode~ repo:org0/repo0',
    '-"def return" +stream',
    "shard partition broadcast",
    "path:src/dir1 +index",
]


def test_indexed_matches_recompute(spark, tiny_corpus, qidx):
    nonzero = 0
    for qs in TINY_QS:
        a = query_string_topk(
            spark, tiny_corpus, qs, 10, round_scores=6
        ).toPandas()
        b = qidx.query_string_topk(qs, 10, round_scores=6).toPandas()
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        nonzero += int(len(a) > 0)
    assert nonzero >= 3


def test_indexed_respects_tombstones(spark, tiny_corpus, qidx, tmp_path_factory):
    import shutil

    from engine.compact import delete_documents
    from engine.index import IndexReader

    qs = "shard partition broadcast"
    base = qidx.query_string_topk(qs, 5, round_scores=6).toPandas()
    assert len(base) > 0
    # clone the index dir, tombstone the top doc, re-serve
    d2 = str(tmp_path_factory.mktemp("qs_idx_del"))
    shutil.rmtree(d2)
    shutil.copytree(qidx.dir, d2)
    top = int(base["doc_id"].iloc[0])
    delete_documents(
        spark, d2, spark.createDataFrame([(top,)], "doc_id long")
    )
    after = IndexReader(spark, d2).query_string_topk(
        qs, 5, round_scores=6
    ).toPandas()
    assert top not in set(after["doc_id"])
    assert len(after) == 5  # still exactly-k over live docs


def test_indexed_lang_filter_raises(qidx):
    with pytest.raises(ValueError, match="lang filters"):
        qidx.query_string_topk("lang:py value", 5)


def test_indexed_suggest_and_empty(spark, qidx):
    sug = qidx.suggest_terms("se", 5).toPandas()
    assert len(sug) > 0 and sug["term"].str.startswith("se").all()
    # df DESC, term ASC pinned order
    assert sug.sort_values(
        ["df", "term"], ascending=[False, True], ignore_index=True
    ).equals(sug.reset_index(drop=True))
    assert qidx.query_string_topk("zzzqqq*", 5).count() == 0


def test_stemmed_index_rejects_query_string(spark, tiny_corpus, tmp_path_factory):
    from engine.index import build_index

    d = str(tmp_path_factory.mktemp("qs_idx_stem"))
    r = build_index(
        spark, tiny_corpus, d, use_stem=True, n_shards=4, n_chunks=1
    )
    with pytest.raises(ValueError, match="unstemmed"):
        r.query_string_topk("value", 5)
    with pytest.raises(ValueError, match="unstemmed"):
        r.suggest_terms("va", 5)


# --------------------------------------------------------- plan audits

def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_recompute_match_predicate_is_codegen(spark, tiny_corpus):
    # the match pass (must/not probes + phrase counting) must stay
    # JVM-side: no row-at-a-time Python eval anywhere in the plan
    df = query_string_topk(
        spark, tiny_corpus, '+merge seg* "def return" -rollback', 10
    )
    p = _plan_of(df)
    assert "BatchEvalPython" not in p and "PythonUDF" not in p, p


def test_indexed_plans_prune_terms_and_push_filters(spark, qidx):
    # scoring + constraint posting scans must isin-prune on term, and
    # the doc_stats metadata filter must reach the parquet scan
    df = qidx.query_string_topk('+merge block repo:org0/repo0', 10)
    p = _plan_of(df)
    assert "PushedFilters" in p and "In(term" in p, p
    assert "EqualTo(repo,org0/repo0)" in p, p


def test_suggest_dictionary_scan_is_pruned(spark, qidx):
    p = _plan_of(qidx.suggest_terms("se", 10))
    assert "StringStartsWith(term,se)" in p, p


# ------------------------------------------------------- boost property

def test_boost_parse_property():
    """Property: for any mix of bare and ^boosted appearances of terms
    from a stopword-free alphabet, parse_query's boosts map holds
    exactly the max explicit boost per term, and bare-only terms carry
    no entry."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    terms = st.sampled_from(["scanx", "mergey", "fastq", "tablez"])
    clause = st.tuples(terms, st.one_of(
        st.none(),
        st.floats(min_value=0.1, max_value=9.5).map(lambda b: round(b, 2)),
    ))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(clause, min_size=1, max_size=8))
    def check(clauses):
        qs = " ".join(
            t if b is None else f"{t}^{b}" for t, b in clauses
        )
        p = parse_query(qs)
        want = {}
        for t, b in clauses:
            if b is not None:
                want[t] = max(want.get(t, b), b)
        assert dict(p.boosts) == want
        assert set(p.should) == {t for t, _ in clauses}

    check()
