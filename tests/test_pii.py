"""PII redaction + URL/domain profiling: semantic checks on crafted
input plus direct DuckDB parity for the two driver entries at sf0.001
(the full sf0.01 sweep in test_driver_contract.py also covers them)."""

import pathlib
import sys

import duckdb
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "write to alice.smith+spam@corp.example.com or bob@b.io today"),
        (2, "server at 10.0.0.1 and 192.168.255.3, version 1.2.3 is fine"),
        (3, "call +1-555-0101 or +44-208-9460-958 now"),
        (4, "links https://docs.example.org/a/b and http://cdn.example.org"),
        (5, ""),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_pii_stats_counts(docs):
    from engine.pii import pii_stats

    out = {r["doc_id"]: r.asDict() for r in pii_stats(docs).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_ipv4"] == 0
    assert out[2]["n_ipv4"] == 2  # 1.2.3 is not an IPv4
    assert out[3]["n_phones"] == 2
    assert out[4]["n_urls"] == 2
    assert all(v == 0 for k, v in out[5].items() if k != "doc_id")
    assert all(v == 0 for k, v in out[6].items() if k != "doc_id")


def test_pii_redact_tags_and_count(docs):
    from engine.pii import pii_redact

    out = {r["doc_id"]: r.asDict() for r in pii_redact(docs).collect()}
    assert out[1]["redacted"] == "write to <EMAIL> or <EMAIL> today"
    assert out[1]["n_pii"] == 2
    assert out[2]["redacted"] == "server at <IP> and <IP>, version 1.2.3 is fine"
    assert out[3]["redacted"] == "call <PHONE> or <PHONE> now"
    # URLs are profiled, not redacted
    assert "https://docs.example.org/a/b" in out[4]["redacted"]
    assert out[6]["redacted"] == ""  # null content → empty, not null


def test_url_domains(docs):
    from engine.pii import url_domains

    out = {r["domain"]: (r["n_urls"], r["n_docs"])
           for r in url_domains(docs).collect()}
    assert out == {"docs.example.org": (1, 1), "cdn.example.org": (1, 1)}


def test_redaction_idempotent_property():
    """Property (pure-regex, engine-independent because the Java/RE2/
    Python agreement on this syntax subset is pinned by the
    cross-engine tests above): redact(redact(x)) == redact(x), and the
    per-pattern counts of a redacted text are zero — replacement tags
    must never re-match any PII pattern."""
    import re

    from hypothesis import given, settings, strategies as st

    from engine.pii import (
        EMAIL_RE, EMAIL_TAG, IPV4_RE, IPV4_TAG, PHONE_RE, PHONE_TAG,
    )

    def redact(s: str) -> str:
        s = re.sub(EMAIL_RE, EMAIL_TAG, s)
        s = re.sub(PHONE_RE, PHONE_TAG, s)
        return re.sub(IPV4_RE, IPV4_TAG, s)

    pii_bits = st.sampled_from([
        "a.b+x@foo-bar.co.uk", "u@x.io", "10.0.0.1", "255.255.255.255",
        "+1-555-0101", "+44-208-9460-958", "https://a.b.c/d",
    ])
    filler = st.text(
        alphabet=st.characters(whitelist_categories=("L", "N", "P", "Z")),
        max_size=30,
    )
    doc = st.lists(st.one_of(pii_bits, filler), max_size=8).map(" ".join)

    @given(doc)
    @settings(max_examples=200, deadline=None)
    def check(s):
        r = redact(s)
        assert redact(r) == r
        for pat in (EMAIL_RE, PHONE_RE, IPV4_RE):
            assert not re.search(pat, r), (s, r, pat)

    check()


def test_injected_driver_parity(spark):
    """The two driver entries against their DuckDB oracles at sf0.001,
    exact values (the injector guarantees every regex path fires)."""
    from engine import driver_queries as dq

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    qs, sqls = dq.spark_queries(), dq.oracle_sqls()
    for name in ("pii_redact", "url_domains"):
        got = qs[name](spark, SF_DIR).toPandas()
        want = con.sql(sqls[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        g = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns), ignore_index=True)
        w = want[sorted(want.columns)].sort_values(
            by=sorted(want.columns), ignore_index=True)
        assert g.equals(w), f"{name}: value mismatch"
