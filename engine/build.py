"""Index build — logical stages (SURVEY.md §3.1).

Stage 1 (this module's `tokens_df`): corpus → (doc_id, term, tf,
doc_len) via `mapInPandas` — Arrow-batched, vectorized per
BASELINE.json:15 ("no per-row Python"); tokenization/stopwords/stemming
happen ONCE here inside the batch loop rather than exploding raw tokens
through the row pipeline (SURVEY.md §1.3: at 10^12-file scale the
exploded token stream is ~10^2 rows per doc — computing per-doc tf
inside the UDF shrinks the shuffle input by the average tf factor).

Stage 2+ (physical compressed postings, dictionary, doc stats,
manifest, checkpoint resume) lives in `build_index` below and
engine/postings.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tokenizer import batch_doc_terms, batch_doc_token_arrays

TOKENS_SCHEMA = "doc_id long, term string, tf long, doc_len long"
DOC_TOKENS_SCHEMA = (
    "doc_id long, terms array<string>, tfs array<long>, doc_len long, "
    "title_terms array<string>"
)


def tokens_df(
    corpus: DataFrame, *, use_stem: bool = True, passthrough: list[str] | None = None
) -> DataFrame:
    """(doc_id, content) → (doc_id, term, tf, doc_len); one row per
    distinct (doc, term). Docs whose content yields zero tokens emit no
    rows — doc-stat helpers must left-join against the corpus ids.

    ``passthrough`` names extra per-doc columns to replicate onto every
    output row (e.g. a precomputed ``shard``) — carrying them through
    the UDF preserves the input's partitioning so the caller can write
    partitioned output with NO post-tokenize shuffle."""
    extra = list(passthrough or [])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = batch_doc_terms(
                pdf["doc_id"].to_numpy(), pdf["content"], use_stem=use_stem
            )
            if extra:
                lookup = pdf.set_index("doc_id")
                for c in extra:
                    out[c] = lookup[c].reindex(out["doc_id"]).to_numpy()
            yield out

    schema = TOKENS_SCHEMA
    if extra:
        dtypes = dict(zip(corpus.schema.names, [f.dataType.simpleString() for f in corpus.schema.fields]))
        schema = TOKENS_SCHEMA + ", " + ", ".join(f"{c} {dtypes[c]}" for c in extra)
    return corpus.select("doc_id", "content", *extra).mapInPandas(_batches, schema)


def doc_tokens_df(
    corpus: DataFrame, *, use_stem: bool = True, passthrough: list[str] | None = None
) -> DataFrame:
    """Array-form tokens, one row per doc (the build checkpoint shape —
    see engine/tokenizer.batch_doc_token_arrays). Emits EVERY corpus
    doc, including zero-token ones."""
    extra = list(passthrough or [])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = batch_doc_token_arrays(
                pdf["doc_id"].to_numpy(), pdf["content"], use_stem=use_stem
            )
            for c in extra:
                out[c] = pdf[c].to_numpy()
            yield out

    schema = DOC_TOKENS_SCHEMA
    if extra:
        dtypes = dict(
            zip(corpus.schema.names, [f.dataType.simpleString() for f in corpus.schema.fields])
        )
        schema = DOC_TOKENS_SCHEMA + ", " + ", ".join(f"{c} {dtypes[c]}" for c in extra)
    return corpus.select("doc_id", "content", *extra).mapInPandas(_batches, schema)


def explode_doc_tokens(doc_tokens: DataFrame) -> DataFrame:
    """Array form → exploded (doc_id, term, tf, doc_len) rows (JVM-side
    explode; used by the dictionary aggregate)."""
    z = F.explode(F.arrays_zip("terms", "tfs")).alias("e")
    return doc_tokens.select("doc_id", "doc_len", z).select(
        "doc_id",
        F.col("e.terms").alias("term"),
        F.col("e.tfs").alias("tf"),
        "doc_len",
    )


def doc_stats_df(corpus: DataFrame, tokens: DataFrame) -> DataFrame:
    """(doc_id, doc_len) for EVERY corpus doc (zero-token docs included —
    they participate in N/avgdl exactly as in the oracle)."""
    lens = tokens.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    return (
        corpus.select("doc_id")
        .join(lens, "doc_id", "left")
        .select("doc_id", F.coalesce("doc_len", F.lit(0)).alias("doc_len"))
    )


def corpus_stats_df(doc_stats: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl)."""
    return doc_stats.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )


def dictionary_df(tokens: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency + collection term frequency in
    one pass (SURVEY.md §2.3 A3+A4 — exact counts; rank-identity forbids
    approx_count_distinct). (doc_id, term) is unique in `tokens`, so
    df = count(*). cf sums the CAPPED tf (2-byte posting bound)."""
    from . import TF_CAP

    return tokens.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum(F.least(F.col("tf"), F.lit(TF_CAP))).alias("cf"),
    )
