"""Physical-plan audits for the sketch + PII family: the 100 TB
claims in engine/pii.py and engine/sketch.py must be visible in the
plans — zero-shuffle redaction, fixed-size sketch aggregation, and
term pruning pushed into the KMV artifact scan."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc {i} text with filler email u{i}@x{i % 3}.com")
            for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_pii_redact_zero_exchange(docs):
    """pii_redact is a pure projection: no Exchange anywhere in the
    plan — redaction scans at tokenizer-class throughput."""
    from engine.pii import pii_redact

    p = plan_of(pii_redact(docs))
    assert "Exchange" not in p, p


def test_pii_stats_zero_exchange(docs):
    from engine.pii import pii_stats

    p = plan_of(pii_stats(docs))
    assert "Exchange" not in p, p


def test_url_domains_distinct_agg_shape(docs):
    """url_domains: the standard two-phase count-distinct plan — an
    exchange keyed (domain, doc_id) for the distinct then one keyed
    domain, BOTH fed by map-side partial aggregates (shuffle volume is
    distinct (domain, doc_id) pairs, never the raw URL stream)."""
    from engine.pii import url_domains

    p = plan_of(url_domains(docs))
    assert p.count("hashpartitioning(") == 2, p
    assert "partial_count" in p, p
    assert "hashpartitioning(domain" in p, p


def test_hll_register_agg_is_partial(docs):
    """HLL register build: the bucket groupBy carries a partial_max
    below the exchange — sketch state combines map-side, the
    tree-aggregation shape."""
    from engine.sketch import hll_distinct

    from engine.ids import sha256_col

    d = docs.select(sha256_col(F.col("content")).alias("sha"))
    p = plan_of(hll_distinct(d, "sha"))
    assert "partial_max" in p, p


def test_kmv_probe_prunes_terms_on_artifact_scan(spark, tiny_corpus,
                                                 tmp_path_factory):
    """hit_counts_approx: the query's term set must reach the KMV
    artifact parquet scan as a pushed In(term) filter — the probe
    reads <= q*k rows, not the sketch table."""
    from engine.index import build_index

    d = str(tmp_path_factory.mktemp("kmv_plan_idx"))
    reader = build_index(
        spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=1
    )
    reader.kmv_sketches_df().count()  # materialize the artifact
    p = plan_of(reader.hit_counts_approx({"q": "index merge segment"}))
    assert "PushedFilters" in p and "In(term" in p, p
