"""Fuzzy term matching (spell correction) over the dictionary.

The reference family has no typo tolerance; fuzzy term lookup is the
standard front-door for one (suggest/correct a query term before
retrieval), added round 3 with the same oracle discipline as the rest
of SURVEY.md §2.

Pinned semantics
----------------
Candidates are dictionary terms (unstemmed, the filtered-token
vocabulary) within Levenshtein distance ``max_edits`` (default 1) of
the query term; ranked by (distance asc, df desc, term asc) — closer
first, then more frequent, then lexicographic for determinism. The
query term itself (distance 0) ranks first when present.

Scale shape (SymSpell deletion neighborhood)
--------------------------------------------
A 10^8-term dictionary cannot be levenshtein-scanned per query. The
classic candidate generator: two terms are within edit distance 1
only if their single-character-deletion neighborhoods intersect
(delete-at-same-spot ≡ substitution, self ∈ own neighborhood covers
insert/delete). So the scale path explodes each dictionary term into
its ≤ len+1 deletion keys — pure codegen (transform over a sequence +
Column.substr), no shuffle — and prunes with ``key isin(query keys)``
BEFORE any exchange; only the surviving candidates (a handful) reach
the distinct + exact-levenshtein verify (the neighborhood test admits
distance-2 pairs like "ab"/"ba", so the verify filter is required for
exactness). Materializing the exploded keys as a build artifact
(partitioned by key prefix) would make this an O(keys) point lookup;
the on-the-fly path here already reads the dictionary once with no
shuffle before the candidate cut.

``fuzzy_terms_brute`` is the full-scan levenshtein verifier
(parity-tested); ``fuzzy_terms_sql`` is the DuckDB mirror (the driver
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tokenizer import tokenize


def deletion_keys_py(term: str) -> list[str]:
    """The term plus every single-character deletion (Python twin of
    the codegen expression — used for the tiny query side)."""
    return [term] + [term[:i] + term[i + 1 :] for i in range(len(term))]


def _deletion_keys_col(term):
    """Codegen deletion-neighborhood: array(term, del_1, ..., del_len)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(term)),
        lambda i: F.concat(
            term.substr(F.lit(1), i - F.lit(1)),
            term.substr(i + F.lit(1), F.length(term) - i),
        ),
    )
    return F.array_distinct(F.concat(F.array(term), dels))


def _normalize_query_term(query_term: str) -> str | None:
    toks = tokenize(query_term, use_stem=False)
    return toks[0] if toks else None


_EMPTY_SCHEMA = "rank int, term string, dist long, df long"


def _ranked_fuzzy(cand: DataFrame, k: int) -> DataFrame:
    order = [F.asc("dist"), F.desc("df"), F.asc("term")]
    topk = cand.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "term", "dist", "df"
    )


def fuzzy_terms(
    spark: SparkSession,
    dictionary: DataFrame,
    query_term: str,
    max_edits: int = 1,
    k: int = 10,
) -> DataFrame:
    """(rank, term, dist, df) — dictionary terms within ``max_edits``
    (must be 1: the deletion-neighborhood generator is depth-1) of the
    query term, via deletion-key candidate join + exact verify.

    ``dictionary`` carries (term, df) — engine/build.dictionary_df or
    IndexReader.dictionary()."""
    if max_edits != 1:
        raise ValueError("deletion-neighborhood path is pinned to max_edits=1")
    q = _normalize_query_term(query_term)
    if q is None:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    q_keys = deletion_keys_py(q)
    cand = (
        dictionary.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.explode(_deletion_keys_col(F.col("term"))).alias("key"),
        )
        .where(F.col("key").isin(q_keys))
        .select("term", "df")
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)).cast("long"))
        .where(F.col("dist") <= max_edits)
    )
    return _ranked_fuzzy(cand, k)


def fuzzy_terms_brute(
    spark: SparkSession,
    dictionary: DataFrame,
    query_term: str,
    max_edits: int = 1,
    k: int = 10,
) -> DataFrame:
    """Full-scan exact verifier: levenshtein over every dictionary term
    (any max_edits). Rank-identical to fuzzy_terms for max_edits=1."""
    q = _normalize_query_term(query_term)
    if q is None:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    cand = (
        dictionary.select("term", F.col("df").cast("long").alias("df"))
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)).cast("long"))
        .where(F.col("dist") <= max_edits)
    )
    return _ranked_fuzzy(cand, k)


def fuzzy_terms_sql(query_term: str, max_edits: int = 1, k: int = 10) -> str:
    """DuckDB mirror over the `documents` view (exact levenshtein scan
    of the derived dictionary)."""
    q = _normalize_query_term(query_term)
    if q is None:
        return (
            "SELECT 0::INTEGER AS rank, '' AS term, 0::BIGINT AS dist, "
            "0::BIGINT AS df WHERE false"
        )
    from .phrase import _tokd_cte

    qq = q.replace("'", "''")
    return f"""
WITH {_tokd_cte()},
dict AS (
  SELECT term, count(*)::BIGINT AS df FROM (
    SELECT DISTINCT doc_id, unnest(toks) AS term FROM tokd
  ) GROUP BY term
),
cand AS (
  SELECT term, levenshtein(term, '{qq}')::BIGINT AS dist, df
  FROM dict WHERE levenshtein(term, '{qq}') <= {max_edits}
)
SELECT row_number() OVER (ORDER BY dist ASC, df DESC, term ASC)::INTEGER AS rank,
       term, dist, df
FROM cand ORDER BY dist ASC, df DESC, term ASC LIMIT {k}
"""


# ------------------------------------------- fuzzy match (scored query)

def fuzzy_expansion_weights(
    dictionary: DataFrame,
    query: str,
    max_expansions: int = 50,
    *,
    use_stem: bool = False,
) -> DataFrame:
    """(term, qtf double) — the fuzzy-match expansion frame: every
    dictionary term within edit distance ≤ 1 of a query term, weighted
    by the fuzzy similarity boost.

    Pinned semantics (ES ``match`` + ``fuzziness: 1`` analog, exact
    weights so the entry is value-hash checkable):

    - per query term the candidate set is capped at ``max_expansions``
      in the pinned fuzzy order (dist ASC, df DESC, term ASC) — the
      Lucene ``maxExpansions`` guard, same order as ``fuzzy_terms``;
    - each surviving expansion m of query term t carries weight
      ``qtf_t · (1 − dist/least(len(t), len(m)))`` (the classic
      FuzzyQuery similarity boost; an in-vocabulary query term is its
      own distance-0 expansion at full weight);
    - a term reachable from SEVERAL query terms takes its MAX weight,
      not the sum — max is associative-order-free, so Spark and DuckDB
      agree bit-for-bit without relying on float-sum order;
    - zero-weight expansions (dist 1 from a 1-char term) are dropped.

    Scale shape: candidates come from the SymSpell deletion-key join
    above (codegen explode + isin cut BEFORE any exchange), so the
    frame's cost is candidate-sized, never vocabulary-sized. The frame
    then plays the query-terms role of the standard BM25 plan (each
    expansion scores with its own idf), exactly like wildcard/regexp
    expansion."""
    spark = dictionary.sparkSession
    qtf: dict[str, int] = {}
    for t in tokenize(query, use_stem=use_stem):
        qtf[t] = qtf.get(t, 0) + 1
    if not qtf:
        return spark.createDataFrame([], "term string, qtf double")
    q_rows = [
        (t, float(c), key)
        for t, c in sorted(qtf.items())
        for key in deletion_keys_py(t)
    ]
    qk = spark.createDataFrame(q_rows, "qterm string, qtf double, key string")
    all_keys = sorted({r[2] for r in q_rows})
    cand = (
        dictionary.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.explode(_deletion_keys_col(F.col("term"))).alias("key"),
        )
        .where(F.col("key").isin(all_keys))
        .join(F.broadcast(qk), "key")
        .select("qterm", "qtf", "term", "df")
        .distinct()
        .withColumn(
            "dist",
            F.levenshtein(F.col("term"), F.col("qterm")).cast("long"),
        )
        .where(F.col("dist") <= 1)
    )
    w = Window.partitionBy("qterm").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    weight = F.col("qtf") * (
        F.lit(1.0)
        - F.col("dist").cast("double")
        / F.least(F.length("qterm"), F.length("term"))
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_expansions)
        .groupBy("term")
        .agg(F.max(weight).alias("qtf"))
        .where(F.col("qtf") > 0)
    )


def fuzzy_match_topk(
    spark: SparkSession,
    corpus: DataFrame,
    query: str,
    k: int = 10,
    max_expansions: int = 50,
    *,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — typo-tolerant BM25 search, recompute
    path: the fuzzy expansion frame (``fuzzy_expansion_weights``) plays
    the query-terms frame of the exhaustive BM25 plan, each expansion
    scoring with its own idf × its fuzzy weight. DuckDB mirror:
    ``engine.driver_queries.fuzzy_match_sql``. Indexed twin:
    ``engine.index.IndexReader.fuzzy_match_topk``."""
    from .build import dictionary_df, tokens_df
    from .query import bm25_scored_terms
    from .ranking import _ranked

    toks = tokens_df(corpus, use_stem=False).persist()
    qterms = fuzzy_expansion_weights(
        dictionary_df(toks), query, max_expansions
    )
    scored = bm25_scored_terms(corpus, qterms, use_stem=False, tokens=toks)
    agg = scored.groupBy("doc_id").agg(F.sum("partial_score").alias("score"))
    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(agg, "score", k)


# ------------------------------------------------ did-you-mean (query level)

_DYM_SCHEMA = (
    "pos int, input_term string, suggestion string, dist long, df long"
)


def did_you_mean(
    spark: SparkSession, dictionary: DataFrame, query: str
) -> DataFrame:
    """(pos, input_term, suggestion, dist, df) — the best correction
    per query position (ES phrase-suggester analog, one candidate per
    term). 'Best' is the pinned fuzzy order (dist ASC, df DESC, term
    ASC) within edit distance ≤ 1; an in-vocabulary term is its own
    distance-0 best, so only true misspellings get rewritten. Positions
    whose term has NO candidate within distance 1 emit no row (nothing
    to suggest). The query is analyzed with the standard chain
    (lowercase, stopword filter, unstemmed — corrections must be
    surface forms, not stems).

    Scale shape: the query side is |terms| × (len+1) deletion keys —
    driver-tiny, broadcast; the dictionary side reuses the SymSpell
    explode of fuzzy_terms (pure codegen, no shuffle before the key
    semi-join cut), so the exchange after the cut carries only the
    handful of surviving candidates; the per-position best is a window
    over that handful. DuckDB mirror: did_you_mean_sql."""
    terms = tokenize(query, use_stem=False)
    if not terms:
        return spark.createDataFrame([], _DYM_SCHEMA)
    q_rows = [
        (i + 1, t, key)
        for i, t in enumerate(terms)
        for key in deletion_keys_py(t)
    ]
    qk = spark.createDataFrame(q_rows, "pos int, input_term string, key string")
    all_keys = sorted({r[2] for r in q_rows})
    cand = (
        dictionary.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.explode(_deletion_keys_col(F.col("term"))).alias("key"),
        )
        .where(F.col("key").isin(all_keys))
        .join(F.broadcast(qk), "key")
        .select("pos", "input_term", F.col("term").alias("suggestion"), "df")
        .distinct()
        .withColumn(
            "dist",
            F.levenshtein(F.col("suggestion"), F.col("input_term")).cast("long"),
        )
        .where(F.col("dist") <= 1)
    )
    w = Window.partitionBy("pos").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("suggestion")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("pos", "input_term", "suggestion", "dist", "df")
        .orderBy("pos")
    )


def did_you_mean_sql(query: str) -> str:
    """DuckDB mirror of did_you_mean over the `documents` view (exact
    levenshtein scan of the derived dictionary — the brute twin of the
    Spark side's deletion-key candidate cut)."""
    from .phrase import _tokd_cte

    terms = tokenize(query, use_stem=False)
    if not terms:
        return (
            "SELECT 0::INTEGER AS pos, '' AS input_term, '' AS suggestion, "
            "0::BIGINT AS dist, 0::BIGINT AS df WHERE false"
        )
    rows = ", ".join(
        f"({i + 1}, '" + t.replace("'", "''") + "')"
        for i, t in enumerate(terms)
    )
    return f"""
WITH {_tokd_cte()},
dict AS (
  SELECT term, count(*)::BIGINT AS df FROM (
    SELECT DISTINCT doc_id, unnest(toks) AS term FROM tokd
  ) GROUP BY term
),
q(pos, input_term) AS (VALUES {rows}),
cand AS (
  SELECT q.pos::INTEGER AS pos, q.input_term, d.term AS suggestion,
         levenshtein(d.term, q.input_term)::BIGINT AS dist, d.df
  FROM q CROSS JOIN dict d
  WHERE levenshtein(d.term, q.input_term) <= 1
),
best AS (
  SELECT *, row_number() OVER (
    PARTITION BY pos ORDER BY dist ASC, df DESC, suggestion ASC
  ) AS rn FROM cand
)
SELECT pos, input_term, suggestion, dist, df
FROM best WHERE rn = 1 ORDER BY pos
"""
