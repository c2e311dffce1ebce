"""PII redaction + URL/domain analysis for a training-data pipeline.

Standard pre-training hygiene steps (the CCNet / Dolma / FineWeb
recipe): scrub e-mail addresses, IPv4 addresses and phone numbers from
the content column before packing, and profile outbound URLs by domain
for blocklist-style source filtering. Both operators are pure
whole-stage-codegen column expressions (regexp_extract_all /
regexp_replace) — no Python in the row path, no shuffle for the
per-doc redaction, one count-style groupBy for the domain profile —
so they scan at tokenizer-class throughput at 100 TB.

Cross-engine parity: every pattern below is written in the syntax
subset where Java regex (Spark) and RE2 (DuckDB) agree — character
classes, bounded repetition, ``\\b`` word boundaries, a single
capture group; no lookaround, no backreferences. The DuckDB oracles
in this module mirror the Spark expressions 1:1, and the driver
entries inject deterministic doc_id-derived PII/URLs into the
synthetic corpus (which contains none) so the regex paths are
actually exercised on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared Java/RE2 patterns (see module docstring for the syntax rules).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}-\d{3}-\d{3,4}(-\d{1,4})?"
URL_RE = r"https?://[A-Za-z0-9.-]+(/[^ \t\n]*)?"
URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"

EMAIL_TAG = "<EMAIL>"
IPV4_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def _count(col: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pat), 0)).cast("long")


def pii_stats(corpus: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, n_urls) per document.

    Pure projection over the content scan — no shuffle, no Python.
    """
    c = F.coalesce(F.col("content"), F.lit(""))
    return corpus.select(
        "doc_id",
        _count(c, EMAIL_RE).alias("n_emails"),
        _count(c, IPV4_RE).alias("n_ipv4"),
        _count(c, PHONE_RE).alias("n_phones"),
        _count(c, URL_RE).alias("n_urls"),
    )


def pii_redact(corpus: DataFrame) -> DataFrame:
    """(doc_id, n_pii, redacted) — emails → <EMAIL>, phones → <PHONE>,
    IPv4 → <IP>, applied in that fixed order (phone before IP so a
    ``+1-555-...`` run is never half-eaten by the IP rule; email first
    so user@host.tld never matches the bare-domain rules).

    Order matters for byte-identical output, so the same sequence is
    pinned in :func:`pii_redact_sql`.

    ``n_pii`` counts SEQUENTIALLY on the progressively-redacted string
    (emails on the original, phones after email redaction, IPs after
    both) so it equals the number of spans actually replaced — counting
    all three patterns on the original would double-count overlaps
    (e.g. an IPv4-shaped email local part like 1.2.3.4@x.com matches
    both rules but emits one tag; round-4 ADVICE). Mirrored 1:1 in the
    SQL oracle.
    """
    c = F.coalesce(F.col("content"), F.lit(""))
    red1 = F.regexp_replace(c, EMAIL_RE, EMAIL_TAG)
    red2 = F.regexp_replace(red1, PHONE_RE, PHONE_TAG)
    red3 = F.regexp_replace(red2, IPV4_RE, IPV4_TAG)
    n_pii = _count(c, EMAIL_RE) + _count(red1, PHONE_RE) + _count(red2, IPV4_RE)
    return corpus.select(
        "doc_id", n_pii.alias("n_pii"), red3.alias("redacted")
    )


def url_domains(corpus: DataFrame) -> DataFrame:
    """(domain, n_urls, n_docs) — outbound-link profile for
    blocklist-style domain filtering. One explode + one groupBy on the
    (low-cardinality) domain key; partial aggregation keeps the
    shuffle domain-sized, not corpus-sized."""
    c = F.coalesce(F.col("content"), F.lit(""))
    ex = corpus.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(c, F.lit(URL_DOMAIN_RE), 1)
        ).alias("domain"),
    )
    return ex.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


# ------------------------------------------------------- driver injection

def with_injected_pii(docs: DataFrame) -> DataFrame:
    """Deterministically append doc_id-derived PII + URLs to ``content``.

    The synthetic driver corpus contains no emails/IPs/phones/URLs, so
    driver-level parity on the raw table would never exercise the
    regexes. This injector derives the same suffix in Spark and in the
    DuckDB oracle (:func:`_injected_sql`) purely from doc_id, keeping
    the comparison deterministic while giving every pattern real hits.
    """
    i = F.col("doc_id").cast("long")
    suffix = F.concat(
        F.lit(" contact user"), i.cast("string"),
        F.lit("@mail"), (i % 5).cast("string"), F.lit(".example.com"),
        F.lit(" from 10."), (i % 200).cast("string"),
        F.lit(".0."), (i % 256).cast("string"),
        F.lit(" call +1-555-"), (1000 + i % 9000).cast("string"),
        F.lit(" see https://site"), (i % 7).cast("string"),
        F.lit(".example.org/p/"), i.cast("string"),
        F.lit(" and http://cdn"), (i % 3).cast("string"),
        F.lit(".test-data.net"),
    )
    c = F.coalesce(F.col("content"), F.lit(""))
    return docs.withColumn("content", F.concat(c, suffix))


_INJECT_SQL = (
    "coalesce(text, '')"
    " || ' contact user' || doc_id::VARCHAR"
    " || '@mail' || (doc_id % 5)::VARCHAR || '.example.com'"
    " || ' from 10.' || (doc_id % 200)::VARCHAR"
    " || '.0.' || (doc_id % 256)::VARCHAR"
    " || ' call +1-555-' || (1000 + doc_id % 9000)::VARCHAR"
    " || ' see https://site' || (doc_id % 7)::VARCHAR"
    " || '.example.org/p/' || doc_id::VARCHAR"
    " || ' and http://cdn' || (doc_id % 3)::VARCHAR || '.test-data.net'"
)


def _sq(pat: str) -> str:
    """Escape a regex for embedding in a single-quoted SQL literal."""
    return pat.replace("'", "''")


def pii_redact_sql(inject: bool = True) -> str:
    """DuckDB mirror of pii_redact over the driver ``documents``."""
    content = _INJECT_SQL if inject else "coalesce(text, '')"
    e, p, i4 = _sq(EMAIL_RE), _sq(PHONE_RE), _sq(IPV4_RE)
    return f"""
WITH c AS (SELECT doc_id, {content} AS content FROM documents),
r AS (
  SELECT doc_id, content,
         regexp_replace(content, '{e}', '{EMAIL_TAG}', 'g') AS red1
  FROM c
),
r2 AS (
  SELECT doc_id, content, red1,
         regexp_replace(red1, '{p}', '{PHONE_TAG}', 'g') AS red2
  FROM r
)
SELECT doc_id,
       (len(regexp_extract_all(content, '{e}'))
        + len(regexp_extract_all(red1, '{p}'))
        + len(regexp_extract_all(red2, '{i4}')))::BIGINT AS n_pii,
       regexp_replace(red2, '{i4}', '{IPV4_TAG}', 'g') AS redacted
FROM r2
"""


def url_domains_sql(inject: bool = True) -> str:
    """DuckDB mirror of url_domains over the driver ``documents``."""
    content = _INJECT_SQL if inject else "coalesce(text, '')"
    d = _sq(URL_DOMAIN_RE)
    return f"""
WITH c AS (SELECT doc_id, {content} AS content FROM documents),
ex AS (
  SELECT doc_id, unnest(regexp_extract_all(content, '{d}', 1)) AS domain
  FROM c
)
SELECT domain, count(*)::BIGINT AS n_urls,
       count(DISTINCT doc_id)::BIGINT AS n_docs
FROM ex GROUP BY domain
"""
