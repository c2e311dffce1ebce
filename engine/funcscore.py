"""Document-value scoring modifiers — the ES/Lucene ``function_score``
family, plus the ``boosting`` (negative demotion) query and
``minimum_should_match``.

The reference family ranks purely by term statistics; every production
search deployment also re-weights by document-level values (freshness,
length, popularity). These are the standard Lucene/ES forms, pinned so
a DuckDB oracle can replay them exactly:

- :func:`function_score_topk` — BM25 × a **gauss decay** on a numeric
  metadata column:  ``factor = decay ** (((v - origin) / scale) ** 2)``
  (the ES gauss with offset=0 — at ``v = origin ± scale`` the factor is
  exactly ``decay``).  ``boost_mode`` is multiply (the ES default).
- :func:`field_value_factor_topk` — BM25 × ``ln(1 + factor · v)`` (the
  ES ``field_value_factor`` with the ``ln1p`` modifier; ``v`` clamped
  at 0 so negative metadata can't poison the log).
- :func:`boosting_topk` — Lucene ``BoostingQuery``: full BM25 on the
  positive query; docs matching ANY negative-query term keep their
  rank signal but are multiplied by ``negative_boost`` (< 1).  Unlike
  must-not (engine/boolean.py) the demoted docs still appear.
- :func:`msm_topk` — boolean-OR BM25 where only docs matching at least
  ``min_should_match`` DISTINCT query terms may be emitted (the ES
  ``minimum_should_match`` clause). m=1 degenerates to plain BM25;
  m=len(terms) is pure intersection with OR scoring.

Scale shape
-----------
All four reuse the exhaustive-BM25 plan (engine/query.bm25_scored_terms:
one tokenize pass, broadcast query-term semi-join BEFORE any per-doc
math). The extras are cheap by construction:

- the decay / fvf factor is a column expression over the post-agg
  (doc_id, score) frame joined to a NARROW (doc_id, value) projection
  of the metadata — Catalyst prunes the documents scan to two columns;
- the boosting negative set is a second broadcast semi-join on the
  SAME persisted tokens (no second tokenize pass) aggregated to
  distinct doc_ids — posting-list-sized, not corpus-sized;
- msm adds one ``count(*)`` beside the existing ``sum(partial)`` in the
  per-doc aggregate — zero extra shuffle (scored rows are unique per
  (doc, term), so count(*) IS the distinct-terms-matched count).

No new shuffle class anywhere; everything stays whole-stage-codegen
column math. DuckDB mirrors: engine/driver_queries.function_score_sql /
field_value_factor_sql / boosting_sql / msm_sql.

The index-served twin of function_score rides
:meth:`engine.index.IndexReader.bm25_scores_all` (exhaustive union
scoring over pruned posting blocks — decay is rank-UNSAFE to apply
after a top-k cut, so the full matching-doc score set is the only
exact serving path) joined to the same narrow metadata projection;
see driver entry ``function_score_indexed``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def gauss_factor_col(value_col, origin: float, scale: float, decay: float):
    """decay ** (((v - origin) / scale)^2) as a Column — ES gauss decay
    with offset=0, exact at v = origin ± scale."""
    z = (value_col.cast("double") - F.lit(float(origin))) / F.lit(float(scale))
    return F.exp(F.lit(math.log(decay)) * z * z)


def exp_factor_col(value_col, origin: float, scale: float, decay: float):
    """decay ** (|v − origin| / scale) — ES exp decay with offset=0.
    The constant ln(decay)/scale is computed ONCE in CPython and
    inlined, so both engines run the identical IEEE expression."""
    d = F.abs(value_col.cast("double") - F.lit(float(origin)))
    return F.exp(F.lit(math.log(decay) / float(scale)) * d)


def linear_factor_col(value_col, origin: float, scale: float, decay: float):
    """max(0, (s − |v − origin|)/s), s = scale/(1 − decay) — ES linear
    decay with offset=0 (a hard zero beyond the support)."""
    s = float(scale) / (1.0 - float(decay))
    d = F.abs(value_col.cast("double") - F.lit(float(origin)))
    return F.greatest(F.lit(0.0), (F.lit(s) - d) / F.lit(s))


def decay_factor_col(
    decay_fn: str, value_col, origin: float, scale: float, decay: float
):
    """Dispatch on the ES decay-function name: gauss | exp | linear."""
    if decay_fn == "gauss":
        return gauss_factor_col(value_col, origin, scale, decay)
    if decay_fn == "exp":
        return exp_factor_col(value_col, origin, scale, decay)
    if decay_fn == "linear":
        return linear_factor_col(value_col, origin, scale, decay)
    raise ValueError(f"unknown decay function {decay_fn!r}")


def decay_factor_at(decay_fn: str, d: float, scale: float, decay: float) -> float:
    """CPython twin of decay_factor_col at distance ``d`` ≥ 0 — the
    bound side of IndexReader's TA dispatch (inflated by an ulp guard
    there; the per-doc factor is JVM libm, this is CPython libm)."""
    if decay_fn == "gauss":
        z = d / float(scale)
        return math.exp(math.log(decay) * z * z)
    if decay_fn == "exp":
        return math.exp(math.log(decay) / float(scale) * d)
    if decay_fn == "linear":
        s = float(scale) / (1.0 - float(decay))
        return max(0.0, (s - d) / s)
    raise ValueError(f"unknown decay function {decay_fn!r}")


def ln1p_factor_col(value_col, factor: float):
    """ln(1 + factor·max(v, 0)) — ES field_value_factor, ln1p modifier."""
    v = F.greatest(value_col.cast("double"), F.lit(0.0))
    return F.log(F.lit(1.0) + F.lit(float(factor)) * v)


def _modified_topk(
    spark: SparkSession,
    docs: DataFrame,
    query: str,
    k: int,
    factor_col,
    value_field: str,
    *,
    use_stem: bool = False,
    round_scores: int | None = None,
) -> DataFrame:
    """Shared body: exhaustive BM25 agg × a factor over one metadata
    column. ``docs`` must carry doc_id, content, and ``value_field``."""
    from .query import bm25_scored_terms, query_terms_df
    from .ranking import _ranked

    qterms = query_terms_df(spark, query, use_stem=use_stem)
    corpus = docs.select("doc_id", "content")
    scored = bm25_scored_terms(corpus, qterms, use_stem=use_stem)
    agg = scored.groupBy("doc_id").agg(F.sum("partial_score").alias("bm25"))
    meta = docs.select("doc_id", F.col(value_field).alias("_fs_value"))
    out = agg.join(meta, "doc_id").select(
        "doc_id", (F.col("bm25") * factor_col).alias("score")
    )
    if round_scores is not None:
        out = out.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(out, "score", k)


def function_score_topk(
    spark: SparkSession,
    docs: DataFrame,
    query: str,
    k: int = 10,
    *,
    field: str = "n_chars",
    origin: float,
    scale: float,
    decay: float = 0.5,
    decay_fn: str = "gauss",
    use_stem: bool = False,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — BM25 × ``decay_fn`` decay (gauss | exp |
    linear) on ``field``.
    DuckDB mirror: engine.driver_queries.function_score_sql."""
    return _modified_topk(
        spark, docs, query, k,
        decay_factor_col(decay_fn, F.col("_fs_value"), origin, scale, decay),
        field, use_stem=use_stem, round_scores=round_scores,
    )


def field_value_factor_topk(
    spark: SparkSession,
    docs: DataFrame,
    query: str,
    k: int = 10,
    *,
    field: str = "n_chars",
    factor: float = 1.0,
    use_stem: bool = False,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — BM25 × ln(1 + factor·field).
    DuckDB mirror: engine.driver_queries.field_value_factor_sql."""
    return _modified_topk(
        spark, docs, query, k,
        ln1p_factor_col(F.col("_fs_value"), factor),
        field, use_stem=use_stem, round_scores=round_scores,
    )


def boosting_topk(
    spark: SparkSession,
    corpus: DataFrame,
    positive: str,
    negative: str,
    k: int = 10,
    *,
    negative_boost: float = 0.5,
    use_stem: bool = False,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — Lucene BoostingQuery: BM25 on
    ``positive``; docs containing ANY ``negative`` term are multiplied
    by ``negative_boost``. DuckDB mirror: boosting_sql."""
    from .build import tokens_df
    from .query import bm25_scored_terms, query_terms_df
    from .ranking import _ranked
    from .tokenizer import tokenize

    qterms = query_terms_df(spark, positive, use_stem=use_stem)
    toks = tokens_df(corpus, use_stem=use_stem).persist()
    scored = bm25_scored_terms(corpus, qterms, use_stem=use_stem, tokens=toks)
    agg = scored.groupBy("doc_id").agg(F.sum("partial_score").alias("bm25"))

    nterms = sorted(set(tokenize(negative, use_stem=use_stem)))
    if nterms:
        nq = spark.createDataFrame([(t,) for t in nterms], "term string")
        negset = (
            toks.join(F.broadcast(nq), "term")
            .select("doc_id")
            .distinct()
            .withColumn("_neg", F.lit(True))
        )
        agg = agg.join(negset, "doc_id", "left").select(
            "doc_id",
            (
                F.col("bm25")
                * F.when(F.col("_neg"), F.lit(float(negative_boost)))
                .otherwise(F.lit(1.0))
            ).alias("score"),
        )
    else:
        agg = agg.select("doc_id", F.col("bm25").alias("score"))
    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(agg, "score", k)


def msm_topk(
    spark: SparkSession,
    corpus: DataFrame,
    query: str,
    k: int = 10,
    *,
    min_should_match: int = 2,
    use_stem: bool = False,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — OR-scored BM25 restricted to docs
    matching ≥ ``min_should_match`` distinct query terms. DuckDB
    mirror: msm_sql."""
    from .query import bm25_scored_terms, query_terms_df
    from .ranking import _ranked

    qterms = query_terms_df(spark, query, use_stem=use_stem)
    scored = bm25_scored_terms(corpus, qterms, use_stem=use_stem)
    # scored rows are unique per (doc_id, term) — count(*) is the
    # distinct-matched-terms count, no extra countDistinct shuffle
    agg = (
        scored.groupBy("doc_id")
        .agg(
            F.sum("partial_score").alias("score"),
            F.count("*").alias("n_matched"),
        )
        .where(F.col("n_matched") >= int(min_should_match))
        .select("doc_id", "score")
    )
    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(agg, "score", k)
