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


# ------------------------------------- phrase-prefix (match_phrase_prefix)

def phrase_prefix_occurrences_col(content, lead_terms: list[str], last_terms: list[str]):
    """Column: occurrences where ``lead_terms`` match consecutively and
    the NEXT token is any member of ``last_terms`` (the expanded prefix
    set). Same codegen shape and one-tokenize-pass binding discipline
    as phrase_occurrences_col; the last probe is an isin over the
    capped literal expansion list."""
    m = len(lead_terms) + 1

    def _count_in(arr):
        starts = F.sequence(F.lit(1), F.size(arr) - F.lit(m - 1))

        def _match(i):
            cond = None
            for j, t in enumerate(lead_terms):
                c = F.element_at(arr, i + F.lit(j)) == F.lit(t)
                cond = c if cond is None else cond & c
            last = F.element_at(arr, i + F.lit(m - 1)).isin(last_terms)
            return last if cond is None else cond & last

        occ = F.size(F.filter(starts, _match))
        return F.when(F.size(arr) >= m, occ).otherwise(F.lit(0))

    wrapped = F.transform(F.array(tokens_filtered_col(content)), _count_in)
    return F.element_at(wrapped, 1).cast("long")


def match_phrase_prefix_topk(
    spark: SparkSession,
    corpus: DataFrame,
    phrase: str,
    k: int = 10,
    max_expansions: int = 50,
) -> DataFrame:
    """(rank, doc_id, n_occ) — ES ``match_phrase_prefix`` analog: the
    phrase's last token is a PREFIX, expanded against the unstemmed
    dictionary in the repo's pinned wildcard order (df DESC, term ASC,
    capped at ``max_expansions`` — engine/wildcard.prefix_expansions),
    then matched as a multi-phrase: lead terms exact and consecutive,
    the final slot any expansion. Ranked like phrase_topk (n_occ DESC,
    doc_id ASC). The expansion list is a ≤ max_expansions driver
    collect — the same deliberate capped cut the indexed wildcard path
    pins. DuckDB mirror: match_phrase_prefix_sql. Indexed twin:
    engine.index.IndexReader.match_phrase_prefix_topk."""
    from .build import dictionary_df, tokens_df
    from .ranking import _ranked
    from .wildcard import prefix_expansions

    out_schema = "rank int, doc_id long, n_occ long"
    terms = tokenize(phrase, use_stem=False)
    if not terms:
        return spark.createDataFrame([], out_schema)
    lead, pfx = terms[:-1], terms[-1]
    exp = [
        r["term"]
        for r in prefix_expansions(
            dictionary_df(tokens_df(corpus, use_stem=False)), pfx,
            max_expansions,
        ).select("term").collect()
    ]
    if not exp:
        return spark.createDataFrame([], out_schema)
    occ = corpus.select(
        "doc_id",
        phrase_prefix_occurrences_col(F.col("content"), lead, exp).alias("n_occ"),
    ).where(F.col("n_occ") > 0)
    return _ranked(occ, "n_occ", k)


# -------------------------------------- span_near (ordered, slop-bounded)

def span_near_topk(
    spark: SparkSession,
    corpus: DataFrame,
    query: str,
    k: int = 10,
    slop: int = 2,
) -> DataFrame:
    """(rank, doc_id, min_span) — Lucene ``SpanNearQuery(in_order=true)``
    analog: docs where the query's terms appear IN ORDER within a token
    window of ≤ ``len(terms) + slop``; ranked by the smallest such
    ordered window (asc, ties doc_id asc). slop=0 degenerates to the
    exact phrase; the unordered variant is proximity_topk. Terms keep
    their query order and duplicates (``"merge merge fast"`` needs two
    ordered merges) — unlike proximity's distinct-set semantics.

    Plan: the positional stream is isin-pruned to the query's terms
    BEFORE the only exchange, then the ordered chain is an (m−1)-way
    self-join on (doc_id, pos strictly increasing) with the window
    bound pushed into the top join — per doc the joined relation is
    query-term-events-sized (a handful), so the shuffle carries events,
    never the corpus. The indexed twin
    (engine/positions.span_near_from_positions) replaces the join tower
    with a level-walk over decoded position streams. DuckDB mirror:
    span_near_sql (the identical join shape)."""
    from .ranking import _ranked_asc

    out_schema = "rank int, doc_id long, min_span long"
    terms = tokenize(query, use_stem=False)
    if not terms:
        return spark.createDataFrame([], out_schema)
    m = len(terms)
    w = m + int(slop)
    ev = term_positions(corpus).where(
        F.col("term").isin(sorted(set(terms)))
    )
    j = ev.where(F.col("term") == terms[0]).select(
        F.col("doc_id"), F.col("pos").alias("p0")
    )
    for i, t in enumerate(terms[1:], start=1):
        # unique aliases per level: the tower self-joins one lineage
        la, lb = f"l{i}a", f"l{i}b"
        ei = ev.where(F.col("term") == t).select(
            F.col("doc_id"), F.col("pos").alias(f"p{i}")
        )
        j, ei = j.alias(la), ei.alias(lb)
        cond = (
            F.col(f"{la}.doc_id") == F.col(f"{lb}.doc_id")
        ) & (F.col(f"{lb}.p{i}") > F.col(f"{la}.p{i - 1}"))
        if i == m - 1:
            cond = cond & (
                F.col(f"{lb}.p{i}") - F.col(f"{la}.p0") + 1 <= w
            )
        j = j.join(ei, cond).select(f"{la}.*", f"{lb}.p{i}")
    spans = j.select(
        "doc_id",
        (F.col(f"p{m - 1}") - F.col("p0") + F.lit(1)).cast("long").alias("span")
    ) if m > 1 else j.select("doc_id", F.lit(1).cast("long").alias("span"))
    agg = spans.groupBy("doc_id").agg(
        F.min("span").cast("long").alias("min_span")
    )
    return _ranked_asc(agg, "min_span", k)


def span_near_sql(query: str, k: int = 10, slop: int = 2) -> str:
    """DuckDB mirror of span_near_topk — the same ordered-chain
    inequality joins over the unnested positional stream."""
    terms = tokenize(query, use_stem=False)
    if not terms:
        return (
            "SELECT 0::INTEGER AS rank, 0::BIGINT AS doc_id, "
            "0::BIGINT AS min_span WHERE false"
        )
    m = len(terms)
    w = m + int(slop)
    quoted = [t.replace("'", "''") for t in terms]
    in_list = ", ".join(f"'{t}'" for t in sorted(set(quoted)))
    joins = "\n  ".join(
        f"JOIN ev e{i} ON e{i}.doc_id = e0.doc_id AND e{i}.term = '{t}' "
        f"AND e{i}.pos > e{i - 1}.pos"
        for i, t in enumerate(quoted[1:], start=1)
    )
    span = f"(e{m - 1}.pos - e0.pos + 1)" if m > 1 else "1"
    return f"""
WITH {_tokd_cte()},
ev AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id, unnest(toks) AS term,
           (generate_subscripts(toks, 1) - 1)::BIGINT AS pos
    FROM tokd
  ) WHERE term IN ({in_list})
),
spans AS (
  SELECT e0.doc_id, {span}::BIGINT AS span
  FROM ev e0
  {joins}
  WHERE e0.term = '{quoted[0]}' AND {span} <= {w}
),
agg AS (SELECT doc_id, min(span)::BIGINT AS min_span FROM spans GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY min_span ASC, doc_id ASC)::INTEGER AS rank,
       doc_id, min_span
FROM agg ORDER BY min_span ASC, doc_id ASC LIMIT {int(k)}
"""


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
    spans = _proximity_events(corpus, terms).select("doc_id", "span")
    agg = spans.groupBy("doc_id").agg(
        F.min("span").cast("long").alias("min_span")
    )
    return _ranked_asc(agg, "min_span", k)


# ---------------------------------------------- snippets (best window)

SNIPPET_PAD = 2
# span/start packed into one orderable int64 so min() picks (smallest
# span, then smallest start) identically in Spark and DuckDB; positions
# are token offsets, always < 1e9
_SPAN_PACK = 1_000_000_000


def _proximity_events(corpus: DataFrame, terms: list[str]):
    """Shared proximity event frame: (doc_id, pos, span, start) for
    every event position where all terms have occurred."""
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
    return run.where(valid).select(
        "doc_id",
        (F.col("pos") - least + F.lit(1)).alias("span"),
        least.alias("start"),
    )


def snippet_topk(
    spark: SparkSession,
    corpus: DataFrame,
    query: str,
    k: int = 10,
    pad: int = SNIPPET_PAD,
) -> DataFrame:
    """(rank, doc_id, min_span, snippet) — proximity top-k with the
    matched window rendered as text: the smallest token window covering
    all distinct query terms (ties → smallest start), padded by ``pad``
    tokens each side and space-joined from the filtered token stream.

    Scale shape: ranking runs on the pruned event stream exactly like
    proximity_topk; the top-k doc_ids (k rows) are then collected and
    pushed down as an isin predicate for the snippet-extraction scan —
    only k documents are re-read and re-tokenized, never the corpus."""
    terms = sorted(set(tokenize(query, use_stem=False)))
    out_schema = "rank int, doc_id long, min_span long, snippet string"
    if not terms:
        return spark.createDataFrame([], out_schema)
    spans = _proximity_events(corpus, terms).select(
        "doc_id",
        (F.col("span") * F.lit(_SPAN_PACK) + F.col("start")).alias("key"),
    )
    agg = spans.groupBy("doc_id").agg(F.min("key").alias("key"))
    topk = agg.orderBy(
        F.asc((F.col("key") / _SPAN_PACK).cast("long")), F.asc("doc_id")
    ).limit(k)
    rows = topk.collect()  # k rows — the deliberate driver-side cut
    if not rows:
        return spark.createDataFrame([], out_schema)
    picked = {int(r["doc_id"]): int(r["key"]) for r in rows}
    return render_snippets(spark, corpus, picked, pad)


def render_snippets(
    spark: SparkSession,
    docs: DataFrame,
    picked: dict[int, int],
    pad: int = SNIPPET_PAD,
) -> DataFrame:
    """(rank, doc_id, min_span, snippet) for the picked docs — ``picked``
    maps doc_id → packed (span, start) key (_SPAN_PACK contract).
    ``docs`` carries (doc_id, content); the isin cut on the k picked ids
    is pushed into its scan (parquet row-group pruning on the docstore),
    so only k documents are read and tokenized."""
    docs = docs.where(F.col("doc_id").isin(list(picked)))
    key_map = F.create_map(
        *[x for d, kk in sorted(picked.items()) for x in (F.lit(d), F.lit(kk))]
    )
    key = key_map[F.col("doc_id")]
    span = (key / _SPAN_PACK).cast("long")
    start = (key % _SPAN_PACK).cast("long")  # 0-based token offset
    toks = tokens_filtered_col(F.col("content"))
    s_tok = F.greatest(start + F.lit(1) - F.lit(pad), F.lit(1))  # 1-based
    length = (start + span + F.lit(pad)).cast("int") - s_tok.cast("int") + F.lit(1)
    snip = F.array_join(F.slice(toks, s_tok.cast("int"), length), " ")
    out = docs.select(
        "doc_id", span.alias("min_span"), snip.alias("snippet")
    )
    w = Window.orderBy(F.asc("min_span"), F.asc("doc_id"))
    return (
        out.orderBy(F.asc("min_span"), F.asc("doc_id"))
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "min_span", "snippet")
    )


def snippet_topk_sql(query: str, k: int = 10, pad: int = SNIPPET_PAD) -> str:
    """DuckDB mirror of snippet_topk — same packed (span, start) min
    and 1-based clamped list slice."""
    terms = sorted(set(tokenize(query, use_stem=False)))
    if not terms:
        return (
            "SELECT 0::INTEGER AS rank, 0::BIGINT AS doc_id, "
            "0::BIGINT AS min_span, '' AS snippet WHERE false"
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
  SELECT doc_id,
         min((pos - {least} + 1) * {_SPAN_PACK} + {least})::BIGINT AS key
  FROM run WHERE {notnull} GROUP BY doc_id
),
topk AS (
  SELECT doc_id, key, (key // {_SPAN_PACK})::BIGINT AS min_span,
         (key % {_SPAN_PACK})::BIGINT AS start
  FROM agg ORDER BY (key // {_SPAN_PACK}), doc_id LIMIT {k}
)
SELECT row_number() OVER (ORDER BY t.min_span ASC, t.doc_id ASC)::INTEGER AS rank,
       t.doc_id, t.min_span,
       array_to_string(
         d.toks[greatest(t.start + 1 - {pad}, 1) :
                (t.start + t.min_span + {pad})::INTEGER], ' ') AS snippet
FROM topk t JOIN tokd d ON t.doc_id = d.doc_id
ORDER BY t.min_span ASC, t.doc_id ASC
"""


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


def match_phrase_prefix_sql(
    phrase: str, k: int = 10, max_expansions: int = 50
) -> str:
    """DuckDB mirror of match_phrase_prefix_topk — positional
    self-joins over the unnested token stream (one join per lead term,
    the last slot an IN over the capped expansion CTE). The dict CTE's
    df (count distinct docs) matches engine/build.dictionary_df and the
    positions artifact's summed block n_docs, so all three twins expand
    in the same pinned order."""
    terms = tokenize(phrase, use_stem=False)
    empty = (
        "SELECT 0::INTEGER AS rank, 0::BIGINT AS doc_id, 0::BIGINT AS n_occ "
        "WHERE false"
    )
    if not terms:
        return empty
    lead = [t.replace("'", "''") for t in terms[:-1]]
    pfx = terms[-1].replace("'", "''")
    joins = "\n  ".join(
        f"JOIN pstream s{j} ON s{j}.doc_id = s0.doc_id "
        f"AND s{j}.p = s0.p + {j} AND s{j}.term = '{t}'"
        for j, t in enumerate(lead[1:], start=1)
    )
    L = len(lead)
    if L == 0:
        starts = (
            "SELECT doc_id, p FROM pstream "
            "WHERE term IN (SELECT term FROM exp)"
        )
    else:
        starts = f"""SELECT s0.doc_id, s0.p
  FROM pstream s0
  {joins}
  JOIN pstream sx ON sx.doc_id = s0.doc_id AND sx.p = s0.p + {L}
       AND sx.term IN (SELECT term FROM exp)
  WHERE s0.term = '{lead[0]}'"""
    return f"""
WITH {_tokd_cte()},
pstream AS (
  SELECT doc_id, unnest(toks) AS term,
         (generate_subscripts(toks, 1) - 1)::BIGINT AS p
  FROM tokd
),
dict AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
         FROM pstream GROUP BY term),
exp AS (SELECT term FROM dict WHERE starts_with(term, '{pfx}')
        ORDER BY df DESC, term ASC LIMIT {int(max_expansions)}),
starts AS ({starts}),
occ AS (SELECT doc_id, count(*)::BIGINT AS n_occ FROM starts GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY n_occ DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, n_occ
FROM occ WHERE n_occ > 0 ORDER BY n_occ DESC, doc_id ASC LIMIT {int(k)}
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
