"""Query-expansion operators: related terms (PMI) and more-like-this.

Both are classic search-engine surfaces the reference family implies
but does not expose (SURVEY.md §2 covers ranked retrieval only):
``related_terms`` is the co-occurrence side of query suggestion,
``more_like_this`` is Lucene's MLT (document → weighted term query →
ranked neighbors). Added with the same recompute + DuckDB-oracle
discipline as the other §2-adjacent operators.

Pinned semantics
----------------
related_terms(t):
- t is pipeline-normalized (lowercase regex token, stopword-checked,
  UNSTEMMED); co-occurrence is DOC-LEVEL over distinct (doc, term)
  pairs (the tfv frame — same distinctness the dictionary uses).
- n_tu = |docs containing both t and u|, u != t, n_tu >= min_cooc.
- pmi = ln( (n_tu * N) / (df_t * df_u) ), rounded to ``round_scores``
  decimals when set (the repo's cross-engine sort-key discipline).
- top-k by (pmi DESC, term ASC); unknown t → empty result.

more_like_this:
- source doc = the corpus row with MIN doc_id (a deterministic pick
  the oracle can reproduce without engine state).
- seed terms = source doc's top ``m_terms`` by the repo's tf-idf
  weight w = (1 + log10(min(tf, TF_CAP))) * log10(N / df), ordered
  (w DESC, term ASC) — the same weighting engine/ranking.py and the
  doc_norms stage pin.
- ranked result = BM25 with qtf=1 per seed term (exactly the pinned
  BM25 of engine/query.py), source doc EXCLUDED, (score DESC,
  doc_id ASC), rounded sort keys when requested.

Scale shape
-----------
related_terms: the target's doc list semi-joins the token stream
(AQE picks broadcast when df_t is small), one groupBy(term) with
map-side combine, then a broadcast of the two scalar frames — a single
corpus-sized exchange beyond the tokenize scan. more_like_this: the
seed-term selection touches ONE doc's rows (tiny ordered limit); the
scoring job is the standard pruned BM25 join. Neither adds a new
shuffle class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import TF_CAP
from .build import corpus_stats_df, dictionary_df, doc_stats_df, tokens_df
from .tokenizer import tokenize


def related_terms(
    spark: SparkSession,
    corpus: DataFrame,
    term: str,
    k: int = 10,
    min_cooc: int = 2,
    *,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, term, n_tu, pmi) — top-k doc-level co-occurring terms.

    DuckDB mirror: engine/driver_queries.related_terms_sql."""
    toks_t = tokenize(term, use_stem=False)
    if len(toks_t) != 1:
        return spark.createDataFrame(
            [], "rank int, term string, n_tu long, pmi double"
        )
    t = toks_t[0]
    # toks feeds dictionary + stats + the hit list + the co-occurrence
    # join — persisted so the corpus tokenizes once per call
    toks = tokens_df(corpus, use_stem=False).persist()
    dic = dictionary_df(toks)
    stats = corpus_stats_df(doc_stats_df(corpus, toks)).select("n_docs")
    hits = toks.where(F.col("term") == t).select("doc_id")
    co = (
        toks.join(hits, "doc_id")
        .where(F.col("term") != t)
        .groupBy("term")
        .agg(F.count("*").alias("n_tu"))
        .where(F.col("n_tu") >= min_cooc)
    )
    df_t = dic.where(F.col("term") == t).select(F.col("df").alias("df_t"))
    pmi = F.log(
        (F.col("n_tu") * F.col("n_docs")).cast("double")
        / (F.col("df_t") * F.col("df")).cast("double")
    )
    if round_scores is not None:
        pmi = F.round(pmi, round_scores)
    scored = (
        co.join(dic.select("term", "df"), "term")
        .crossJoin(F.broadcast(df_t))
        .crossJoin(F.broadcast(stats))
        .select("term", "n_tu", pmi.alias("pmi"))
    )
    topk = scored.orderBy(F.desc("pmi"), F.asc("term")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("pmi"), F.asc("term"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "term", "n_tu", "pmi"
    )


def more_like_this(
    spark: SparkSession,
    corpus: DataFrame,
    k: int = 10,
    m_terms: int = 5,
    *,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — docs most similar to the MIN-doc_id doc.

    DuckDB mirror: engine/driver_queries.more_like_this_sql."""
    from .query import bm25_scored_terms
    from .ranking import _ranked

    # toks feeds dictionary + stats + seed selection + scoring —
    # persisted so the corpus tokenizes once per call
    toks = tokens_df(corpus, use_stem=False).persist()
    dic = dictionary_df(toks)
    stats = corpus_stats_df(doc_stats_df(corpus, toks)).select("n_docs")
    src = corpus.agg(F.min("doc_id").alias("src_id"))
    weight = (
        1.0 + F.log10(F.least(F.col("tf"), F.lit(TF_CAP)).cast("double"))
    ) * F.log10(F.col("n_docs").cast("double") / F.col("df").cast("double"))
    # seed ordering uses a ROUNDED weight sort key (the repo's
    # cross-engine float discipline) so DuckDB picks identical seeds
    seed = (
        toks.join(F.broadcast(src), toks["doc_id"] == F.col("src_id"))
        .join(dic.select("term", "df"), "term")
        .crossJoin(F.broadcast(stats))
        .select("term", F.round(weight, 6).alias("w"))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(m_terms)
    )
    qterms = seed.select("term", F.lit(1).cast("long").alias("qtf"))
    scored = bm25_scored_terms(corpus, qterms, use_stem=False, tokens=toks)
    agg = (
        scored.groupBy("doc_id")
        .agg(F.sum("partial_score").alias("score"))
        .crossJoin(F.broadcast(src))
        .where(F.col("doc_id") != F.col("src_id"))
        .select("doc_id", "score")
    )
    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(agg, "score", k)


# --------------------------------------------- more-like-this (like-text)

def mlt_text(
    spark: SparkSession,
    corpus: DataFrame,
    text: str,
    k: int = 10,
    m_terms: int = 5,
    *,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — docs most similar to ARBITRARY text (the
    ES more_like_this ``like``-text form; more_like_this above is the
    stored-document form). Seed selection is the same pinned rule: per
    text term, weight = (1 + log10(min(tf, TF_CAP))) ×
    log10(N / df) with df from the CORPUS dictionary (terms absent
    from the vocabulary drop — they can't retrieve anything); top
    ``m_terms`` by (rounded weight DESC, term ASC); seeds score as
    qtf=1 BM25. No source exclusion — the text is not a corpus doc.

    Scale shape: the text side is a driver-tiny VALUES frame; df/N
    lookups broadcast-join it against the dictionary; scoring reuses
    the exhaustive plan. DuckDB mirror: mlt_text_sql."""
    from collections import Counter

    from .query import bm25_scored_terms
    from .ranking import _ranked
    from .tokenizer import tokenize

    tf = Counter(tokenize(text, use_stem=False))
    if not tf:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    toks = tokens_df(corpus, use_stem=False).persist()
    dic = dictionary_df(toks)
    stats = corpus_stats_df(doc_stats_df(corpus, toks)).select("n_docs")
    qdf = spark.createDataFrame(
        sorted((t, int(c)) for t, c in tf.items()), "term string, tf long"
    )
    weight = (
        1.0 + F.log10(F.least(F.col("tf"), F.lit(TF_CAP)).cast("double"))
    ) * F.log10(F.col("n_docs").cast("double") / F.col("df").cast("double"))
    seed = (
        dic.select("term", "df")
        .join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(stats))
        .select("term", F.round(weight, 6).alias("w"))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(m_terms)
    )
    qterms = seed.select("term", F.lit(1).cast("long").alias("qtf"))
    scored = bm25_scored_terms(corpus, qterms, use_stem=False, tokens=toks)
    agg = scored.groupBy("doc_id").agg(F.sum("partial_score").alias("score"))
    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(agg, "score", k)
