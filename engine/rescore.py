"""Two-phase query rescoring — the Lucene/Elasticsearch ``rescore``
API analog (SURVEY.md §2.9 search-API family).

Phase 1 ranks cheaply (BM25 over the whole corpus); phase 2 re-scores
ONLY the top ``window_n`` phase-1 hits with a signal too expensive to
evaluate corpus-wide — here an exact phrase-occurrence bonus:

    combined = round(bm25 + weight * n_occ(phrase), 6)

That is the production shape for "recall from the index, precision
from positions": the expensive positional evaluation touches
window_n docs, never the corpus. The window is a k-row driver cut
(the documented snippet_topk pattern, engine/index.py) so the phase-2
corpus access is isin-pushdown pruned; at 100 TB the phase-2 cost is
O(window · doc_len), independent of corpus size.

Twins: recompute (this module), indexed (rescore_from_index — phase 1
on the block-max kernel, phase 2 on the positions artifact), DuckDB
mirror (driver_queries.rescore_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .query import bm25_topk_exhaustive
from .tokenizer import tokenize

RESCORE_WINDOW = 30
RESCORE_WEIGHT = 2.0

_SCHEMA = "rank int, doc_id long, score double, n_occ long"


def _combine(base_small: DataFrame, occ: DataFrame, weight: float,
             round_scores: int, k: int) -> DataFrame:
    """Callers guarantee ``occ`` is window-sized (≤ window_n rows), so
    the left join broadcasts the bonus side against the k-row base."""
    comb = base_small.join(F.broadcast(occ), "doc_id", "left").select(
        "doc_id",
        F.round(
            F.col("score") + F.lit(weight) * F.coalesce("n_occ", F.lit(0)),
            round_scores,
        ).alias("score"),
        F.coalesce("n_occ", F.lit(0)).cast("long").alias("n_occ"),
    )
    topk = comb.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score", "n_occ"
    )


def rescore_topk(
    spark: SparkSession,
    corpus: DataFrame,
    query: str,
    phrase: str,
    k: int = 10,
    *,
    window_n: int = RESCORE_WINDOW,
    weight: float = RESCORE_WEIGHT,
    use_stem: bool = False,
    round_scores: int = 6,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, score, n_occ) — recompute path. ``score`` is the
    combined key; ``n_occ`` the exact phrase count the bonus used.
    Phrase matching is over unstemmed tokens (engine/phrase.py
    semantics) regardless of the scoring tokenization."""
    from .phrase import phrase_occurrences_col

    base = bm25_topk_exhaustive(
        spark, corpus, query, window_n,
        use_stem=use_stem, round_scores=round_scores, tokens=tokens,
    )
    rows = base.collect()  # window_n-row driver cut (snippet_topk pattern)
    if not rows:
        return spark.createDataFrame([], _SCHEMA)
    ids = [r["doc_id"] for r in rows]
    base_small = spark.createDataFrame(
        [(r["doc_id"], r["score"]) for r in rows], "doc_id long, score double"
    )
    terms = tokenize(phrase, use_stem=False)
    occ = (
        corpus.where(F.col("doc_id").isin(ids))
        .select(
            "doc_id",
            phrase_occurrences_col(F.col("content"), terms).alias("n_occ"),
        )
        if terms
        else spark.createDataFrame([], "doc_id long, n_occ long")
    )
    return _combine(base_small, occ, weight, round_scores, k)


def rescore_from_index(
    reader, query: str, phrase: str, k: int = 10, *,
    window_n: int = RESCORE_WINDOW, weight: float = RESCORE_WEIGHT,
    round_scores: int = 6,
) -> DataFrame:
    """Indexed twin: phase 1 on the block-max kernel, phase 2 phrase
    counts from the positions artifact (engine/positions.py kernel over
    the phrase terms' position blocks only), joined to the window."""
    from .positions import _phrase_kernel

    spark = reader.spark
    base = reader.bm25_topk(query, window_n, round_scores=round_scores)
    rows = base.collect()
    if not rows:
        return spark.createDataFrame([], _SCHEMA)
    base_small = spark.createDataFrame(
        [(r["doc_id"], r["score"]) for r in rows], "doc_id long, score double"
    )
    terms = tokenize(phrase, use_stem=False)
    if terms:
        blocks = reader.positions().where(
            F.col("term").isin(sorted(set(terms)))
        )
        occ = blocks.groupBy("shard").applyInPandas(
            _phrase_kernel(terms), "doc_id long, n_occ long"
        ).where(F.col("doc_id").isin([r["doc_id"] for r in rows]))
    else:
        occ = spark.createDataFrame([], "doc_id long, n_occ long")
    return _combine(base_small, occ, weight, round_scores, k)
