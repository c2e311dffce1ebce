"""Cursor pagination — Lucene ``IndexSearcher.searchAfter`` semantics
(SURVEY.md §2.9 search-API family).

A cursor is the previous page's last hit ``(score, doc_id)`` in the
engine's (rounded score DESC, doc_id ASC) sort order; the next page is
the top-k among docs sorting STRICTLY after it. On a duplicate-free
ranking this is value-identical to absolute-rank pagination (page 2 of
size k == ranks k+1..2k), which is exactly what makes it oracle-able:
the DuckDB mirror derives the cursor in-SQL at a pinned rank and
re-ranks the page 1..k.

Why it exists anyway: from+size costs every collector a size
offset+k heap (engine/index.py bm25_topk_paged documents that tax);
searchAfter keeps every per-shard heap at k no matter how deep the
page — the reason production search APIs (Lucene, Elasticsearch
search_after) steer deep paging to cursors. The indexed twin
(IndexReader.search_after) rides the block-max kernel's ``after``
eviction (engine/wand.py); this module is the recompute twin over the
raw corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .query import bm25_scored_terms, query_terms_df


def search_after_topk(
    spark: SparkSession,
    corpus: DataFrame,
    query: str,
    after_score: float,
    after_doc_id: int,
    k: int = 10,
    *,
    use_stem: bool = False,
    round_scores: int | None = None,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — the k docs sorting strictly after the
    cursor, recompute path. Ranks restart at 1 per page (a cursor
    carries no absolute offset). The cursor predicate is applied to the
    ROUNDED score when ``round_scores`` is set — the same key the sort
    uses, so page boundaries are exact across engines."""
    qterms = query_terms_df(spark, query, use_stem=use_stem)
    scored = bm25_scored_terms(corpus, qterms, use_stem=use_stem, tokens=tokens)
    agg = scored.groupBy("doc_id").agg(F.sum("partial_score").alias("score"))
    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    s_a, d_a = float(after_score), int(after_doc_id)
    page = agg.where(
        (F.col("score") < s_a) | ((F.col("score") == s_a) & (F.col("doc_id") > d_a))
    )
    topk = page.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )
