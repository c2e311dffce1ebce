"""Prefix (wildcard ``term*``) search — dictionary expansion + BM25.

The reference family's surface is exact-term bag-of-words; prefix
queries are the canonical wildcard form (Lucene ``PrefixQuery``), so
they're added — like phrase/proximity/boolean/fuzzy — as a first-class
operator with the same oracle discipline as SURVEY.md §2.

Pinned semantics
----------------
- The prefix is lowercased verbatim (NOT stemmed — stemming would
  rewrite the user's literal prefix; Lucene's multi-term queries skip
  analysis the same way) and expanded against the UNSTEMMED dictionary.
- Expansion set = vocabulary terms starting with the prefix, ordered by
  (df DESC, term ASC), capped at ``max_expansions`` (Lucene's
  ``maxExpansions`` guard — an unbounded ``a*`` over a web-scale
  vocabulary would otherwise union millions of posting lists).
- Each expansion scores as a BM25 query term with qtf=1 (Lucene's
  scoring-boolean rewrite, not the constant-score one — it keeps the
  ranking signal and reuses the engine's pinned BM25 exactly).
- Top-k orders by (score DESC, doc_id ASC); ``round_scores`` applies
  the repo's cross-engine rounded-sort-key discipline.

Scale shape
-----------
Recompute: one tokenize pass feeds the dictionary; the expansion is a
tiny (≤ max_expansions rows) ordered limit that BROADCASTS into the
same pruned scoring join as plain BM25 — no new shuffle class. Indexed
(`engine.index.IndexReader.wildcard_topk`): the expansion is a pruned
dictionary-parquet read collected to ≤ max_expansions driver rows, then
the standard isin-pushdown + per-shard block-max kernel serves it — a
prefix query over 100 TB touches only the expanded terms' posting
blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_prefix(prefix: str) -> str:
    """Lowercase, strip a single trailing ``*`` if given, no stemming."""
    p = prefix.strip().lower()
    return p[:-1] if p.endswith("*") else p


def prefix_expansions(
    dictionary: DataFrame, prefix: str, max_expansions: int = 50
) -> DataFrame:
    """(term, df) — capped, deterministically ordered expansion set."""
    p = normalize_prefix(prefix)
    if not p:
        # an empty prefix would be a full-vocabulary union — refuse
        return dictionary.select("term", "df").where(F.lit(False))
    return (
        dictionary.select("term", "df")
        .where(F.col("term").startswith(p))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
    )


def wildcard_topk(
    spark: SparkSession,
    corpus: DataFrame,
    prefix: str,
    k: int = 10,
    max_expansions: int = 50,
    *,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — recompute-from-corpus prefix search.

    DuckDB mirror: ``engine.driver_queries.wildcard_sql`` (the driver
    oracle). The plan reuses the exhaustive BM25 machinery: the
    expansion DataFrame plays the role of the query-terms frame."""
    from .build import dictionary_df, tokens_df
    from .query import bm25_scored_terms
    from .ranking import _ranked

    # toks feeds the dictionary AND the scoring join — persisted so the
    # corpus tokenizes once per call
    toks = tokens_df(corpus, use_stem=False).persist()
    exp = prefix_expansions(dictionary_df(toks), prefix, max_expansions)
    qterms = exp.select("term", F.lit(1).cast("long").alias("qtf"))
    scored = bm25_scored_terms(corpus, qterms, use_stem=False, tokens=toks)
    agg = scored.groupBy("doc_id").agg(F.sum("partial_score").alias("score"))
    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(agg, "score", k)


# ------------------------------------------------ autocomplete (suggest)

def suggest_prefix(dictionary: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """(rank, term, df) — autocomplete suggestions: the top-k dictionary
    terms for a prefix by (df DESC, term ASC). Over an index this is a
    pruned dictionary-parquet scan + ordered limit — zero posting
    access; over 100 TB the dictionary is vocabulary-sized, not
    corpus-sized. DuckDB mirror: suggest_prefix_sql."""
    from pyspark.sql import Window

    exp = prefix_expansions(dictionary, prefix, k)
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    return exp.withColumn("rank", F.row_number().over(w)).select(
        "rank", "term", F.col("df").cast("long").alias("df")
    )


def suggest_prefix_sql(prefix: str, k: int = 10) -> str:
    """DuckDB mirror of suggest_prefix over the driver `documents` view
    (dictionary rebuilt from the text column — same tokenize chain)."""
    from .phrase import _tokd_cte

    p = normalize_prefix(prefix).replace("'", "''")
    if not p:
        return (
            "SELECT 0::INTEGER AS rank, ''::VARCHAR AS term, 0::BIGINT AS df "
            "WHERE false"
        )
    return f"""
WITH {_tokd_cte()},
tfv AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tokd),
dict AS (SELECT term, count(*)::BIGINT AS df FROM tfv GROUP BY term),
top AS (SELECT term, df FROM dict WHERE starts_with(term, '{p}')
        ORDER BY df DESC, term LIMIT {int(k)})
SELECT row_number() OVER (ORDER BY df DESC, term ASC)::INTEGER AS rank, term, df
FROM top ORDER BY df DESC, term ASC
"""


# ------------------------------------------------ regexp query

def regexp_expansions(
    dictionary: DataFrame, pattern: str, max_expansions: int = 50
) -> DataFrame:
    """(term, df) — vocabulary terms whose ENTIRE text matches
    ``pattern`` (Lucene RegexpQuery anchors implicitly), ordered
    (df DESC, term ASC), capped at ``max_expansions``. The pattern is
    matched verbatim against the lowercase dictionary — no analysis,
    like every Lucene multi-term query. Keep patterns to the
    RE2-compatible subset (no backrefs/lookaround) so the Spark (Java
    regex) and DuckDB (RE2) twins agree."""
    if not pattern:
        return dictionary.select("term", "df").where(F.lit(False))
    return (
        dictionary.select("term", "df")
        .where(F.col("term").rlike(f"^(?:{pattern})$"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
    )


def regexp_topk(
    spark: SparkSession,
    corpus: DataFrame,
    pattern: str,
    k: int = 10,
    max_expansions: int = 50,
    *,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — regexp search, recompute path: the
    regexp expansion set plays the query-terms frame of the exhaustive
    BM25 plan with qtf=1 per expansion (the same scoring-boolean
    rewrite wildcard_topk pins). DuckDB mirror:
    engine.driver_queries.regexp_sql. Scale shape matches
    wildcard_topk: the dictionary filter is vocabulary-sized (the rlike
    can't prune the scan, but the dictionary is ~1e7 rows at 100 TB,
    not corpus-sized) and the capped expansion broadcasts into the
    pruned scoring join."""
    from .build import dictionary_df, tokens_df
    from .query import bm25_scored_terms
    from .ranking import _ranked

    toks = tokens_df(corpus, use_stem=False).persist()
    exp = regexp_expansions(dictionary_df(toks), pattern, max_expansions)
    qterms = exp.select("term", F.lit(1).cast("long").alias("qtf"))
    scored = bm25_scored_terms(corpus, qterms, use_stem=False, tokens=toks)
    agg = scored.groupBy("doc_id").agg(F.sum("partial_score").alias("score"))
    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(agg, "score", k)
