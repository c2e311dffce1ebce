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
