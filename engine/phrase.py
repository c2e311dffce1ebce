"""Positional phrase search (SURVEY.md §2 addendum P7/Q7).

The reference family's surface is bag-of-words only; phrase queries are
the standard next capability of a full-text engine, so they're added
here as first-class operators with the same oracle discipline as the
rest of §2.

Pinned semantics
----------------
Positions are 0-based offsets in the ORDERED, stopword-filtered,
UNSTEMMED token stream (engine/textops.tokens_filtered_col — the same
normalization the title/anchor surfaces use). A phrase of m terms
matches a doc at offset i iff ``toks[i:i+m]`` equals the phrase's
token sequence exactly; the phrase itself is tokenized with the same
pipeline, so stopwords inside the phrase are elided ("a table scan" ≡
"table scan"). Score = occurrence count; top-k orders by
(n_occ desc, doc_id asc).

Scale shape
-----------
Everything is JVM-side whole-stage codegen over the token array — the
matcher is ``size(filter(sequence(1, n-m+1), i -> slice(toks,i,m) ==
phrase))`` per row, ZERO shuffles before the final top-k
(TakeOrderedAndProject). No Python, no explode, no join: at 100 TB the
phrase query is a single pruned scan, embarrassingly parallel.
``term_positions`` (the positional-posting construction operator) is
one posexplode — materializing it as an index artifact would reuse the
existing delta+varint codec (engine/codec.py) per (term, doc) position
run; the query path above doesn't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textops import tokens_filtered_col
from .tokenizer import TOKEN_PATTERN, tokenize


def term_positions(corpus: DataFrame) -> DataFrame:
    """(doc_id, term, pos) — positional postings stream; pos is the
    0-based offset in the filtered token sequence. One narrow
    mapInArrow-free projection + posexplode: no shuffle (downstream
    consumers groupBy as needed)."""
    toks = tokens_filtered_col(F.col("content"))
    return (
        corpus.select("doc_id", F.posexplode(toks).alias("pos", "term"))
        .select("doc_id", "term", F.col("pos").cast("long").alias("pos"))
    )


def phrase_occurrences_col(content, phrase_terms: list[str]):
    """Column: number of occurrences of the phrase in content's
    filtered token stream. Pure codegen (no UDF).

    The matcher is an unrolled conjunction of ``element_at`` probes —
    faster than ``slice(toks,i,m) == array`` (no per-position array
    allocation + equality walk, and the AND short-circuits on the first
    term mismatch).

    CRITICAL expression shape: the token array is bound ONCE as a
    lambda variable via a 1-element ``transform`` wrapper. Spark's
    higher-order functions re-evaluate any non-attribute child
    expression on EVERY lambda invocation — referencing
    ``tokens_filtered_col(content)`` directly inside the position
    lambda re-tokenizes the document per candidate position
    (O(positions × doc_len) regex work, verified in the physical
    plan). With the wrapper, probes hit a bound array attribute and
    the whole matcher is one tokenize pass + O(positions · m) cheap
    probes, still pure codegen."""
    m = len(phrase_terms)

    def _count_in(arr):
        starts = F.sequence(F.lit(1), F.size(arr) - F.lit(m - 1))

        def _match(i):
            # starts ≤ size-m+1 keeps every element_at(i+j) in bounds
            cond = F.element_at(arr, i) == F.lit(phrase_terms[0])
            for j in range(1, m):
                cond = cond & (
                    F.element_at(arr, i + F.lit(j)) == F.lit(phrase_terms[j])
                )
            return cond

        occ = F.size(F.filter(starts, _match))
        # sequence(1, x) with x < 1 would DESCEND (Spark picks step
        # -1), so short docs take the 0 branch instead
        return F.when(F.size(arr) >= m, occ).otherwise(F.lit(0))

    wrapped = F.transform(F.array(tokens_filtered_col(content)), _count_in)
    return F.element_at(wrapped, 1).cast("long")


def phrase_topk(
    spark: SparkSession, corpus: DataFrame, phrase: str, k: int = 10
) -> DataFrame:
    """(rank, doc_id, n_occ) — docs containing the exact (filtered)
    phrase, by occurrence count; deterministic (n_occ desc, doc_id asc)."""
    from .ranking import _ranked

    terms = tokenize(phrase, use_stem=False)
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, n_occ long")
    occ = corpus.select(
        "doc_id", phrase_occurrences_col(F.col("content"), terms).alias("n_occ")
    ).where(F.col("n_occ") > 0)
    return _ranked(occ, "n_occ", k)


# ----------------------------------------------- proximity (min-span)

def proximity_topk(
    spark: SparkSession, corpus: DataFrame, query: str, k: int = 10
) -> DataFrame:
    """(rank, doc_id, min_span) — docs containing ALL distinct query
    terms, ranked by the length of the smallest token window covering
    them (asc; ties broken asc doc_id). Same pinned token semantics as
    phrase search: 0-based offsets in the ordered, stopword-filtered,
    UNSTEMMED stream; query terms are deduped (a single-term query
    scores every containing doc min_span = 1).

    Algorithm (the classic last-occurrence sweep, fully relational):
    over the per-doc position stream of ONLY the query's m terms,
    a running ``max(pos) filter term = t_j`` window per term gives, at
    every event position p, the latest occurrence of each term ≤ p;
    where all m are present, ``p - least(last_0..last_{m-1}) + 1`` is
    the minimal window ENDING at p, and the per-doc min over p is the
    global minimum span.

    Scale shape: the isin filter prunes the exploded stream to query-
    term events BEFORE the only shuffle (window partitionBy doc_id);
    the groupBy(doc_id) agg reuses that hash partitioning, so the whole
    query is scan → tiny-event shuffle → window+agg → top-k
    (plan-tested: exactly one exchange before the final ordering)."""
    from .ranking import _ranked_asc

    terms = sorted(set(tokenize(query, use_stem=False)))
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, min_span long")
    ev = term_positions(corpus).where(F.col("term").isin(terms))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lasts = [
        F.max(F.when(F.col("term") == t, F.col("pos"))).over(w).alias(f"_l{j}")
        for j, t in enumerate(terms)
    ]
    run = ev.select("doc_id", "pos", *lasts)
    last_cols = [F.col(f"_l{j}") for j in range(len(terms))]
    least = last_cols[0] if len(terms) == 1 else F.least(*last_cols)
    valid = last_cols[0].isNotNull()
    for c in last_cols[1:]:
        valid = valid & c.isNotNull()
    spans = run.where(valid).select(
        "doc_id", (F.col("pos") - least + F.lit(1)).alias("span")
    )
    agg = spans.groupBy("doc_id").agg(
        F.min("span").cast("long").alias("min_span")
    )
    return _ranked_asc(agg, "min_span", k)


# ------------------------------------------------------------------ SQL
# DuckDB mirrors over the `documents` view (doc_id, text, ...).

def _tokd_cte() -> str:
    from .stopwords import stopwords_sql_list

    pat = TOKEN_PATTERN.replace("'", "''")
    return (
        "tokd AS (SELECT doc_id, "
        f"list_filter(regexp_extract_all(lower(text), '{pat}'), "
        f"t -> t NOT IN {stopwords_sql_list()}) AS toks FROM documents)"
    )


def term_positions_sql() -> str:
    return f"""
WITH {_tokd_cte()}
SELECT doc_id, unnest(toks) AS term,
       (generate_subscripts(toks, 1) - 1)::BIGINT AS pos
FROM tokd
"""


def _phrase_list_sql(terms: list[str]) -> str:
    return "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in terms) + "]"


def proximity_topk_sql(query: str, k: int = 10) -> str:
    """DuckDB mirror of proximity_topk — same last-occurrence sweep via
    window functions over the unnested token stream."""
    terms = sorted(set(tokenize(query, use_stem=False)))
    if not terms:
        return (
            "SELECT 0::INTEGER AS rank, 0::BIGINT AS doc_id, "
            "0::BIGINT AS min_span WHERE false"
        )
    quoted = [t.replace("'", "''") for t in terms]
    in_list = ", ".join(f"'{t}'" for t in quoted)
    lasts = ",\n         ".join(
        f"max(CASE WHEN term = '{t}' THEN pos END) OVER w AS l{j}"
        for j, t in enumerate(quoted)
    )
    lcols = [f"l{j}" for j in range(len(terms))]
    least = lcols[0] if len(terms) == 1 else f"least({', '.join(lcols)})"
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in lcols)
    return f"""
WITH {_tokd_cte()},
ev AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id, unnest(toks) AS term,
           (generate_subscripts(toks, 1) - 1)::BIGINT AS pos
    FROM tokd
  ) WHERE term IN ({in_list})
),
run AS (
  SELECT doc_id, pos,
         {lasts}
  FROM ev
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
agg AS (
  SELECT doc_id, min(pos - {least} + 1)::BIGINT AS min_span
  FROM run WHERE {notnull} GROUP BY doc_id
)
SELECT row_number() OVER (ORDER BY min_span ASC, doc_id ASC)::INTEGER AS rank,
       doc_id, min_span
FROM agg ORDER BY min_span ASC, doc_id ASC LIMIT {k}
"""


def phrase_topk_sql(phrase: str, k: int = 10) -> str:
    terms = tokenize(phrase, use_stem=False)
    if not terms:  # all-stopword/empty phrase: empty result, like Spark
        return (
            "SELECT 0::INTEGER AS rank, 0::BIGINT AS doc_id, 0::BIGINT AS n_occ "
            "WHERE false"
        )
    m = len(terms)
    return f"""
WITH {_tokd_cte()},
occ AS (
  SELECT doc_id,
         len(list_filter(range(1, len(toks) - {m} + 2),
             i -> toks[i:i + {m - 1}] = {_phrase_list_sql(terms)}))::BIGINT AS n_occ
  FROM tokd
)
SELECT row_number() OVER (ORDER BY n_occ DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, n_occ
FROM occ WHERE n_occ > 0 ORDER BY n_occ DESC, doc_id ASC LIMIT {k}
"""
